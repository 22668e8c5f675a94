"""Fused Pallas mesh-traversal kernel — the TPU hot path.

Replaces the XLA cluster pipeline's HBM-round-tripping candidate machinery
(render/mesh_intersect.py: per-block top_k + [R, K2, 512] triangle-row
gathers — hundreds of MB of HBM traffic per wave) with a kernel that keeps
the ENTIRE triangle table resident in VMEM (accel/kernel_tables.py layout).
This is the Pallas replacement for the reference's per-ray BVH descent
(Rayito_Stage6_QT/RAccel.h:471-560), shaped by measurement:

  * Division of labor: Mosaic is good at dense VMEM compute and BAD at
    fine-grained control (a pl.when guard, a VMEM->SMEM DMA wait, a
    lane<->sublane relayout, and a 384-iteration scalar loop each measured
    1-60 µs per 2048 rays). So CANDIDATE SELECTION is its own small kernel
    (_mask_kernel): a [B, C_pad] slab test per ray block, every
    intermediate VMEM-resident, bit-packed per block via an MXU matmul
    against 0/2^k weights. (The same computation expressed in XLA fused
    perfectly in isolation but was split by the full bounce-body jit into
    ~7 fusions materializing [N, C] f32 through HBM — 78 of a 113 ms
    band.) The packed masks ride into the traversal kernel as pipelined
    per-step SMEM blocks — whole-array scalar prefetch costs ~32 B of SMEM
    per entry and caps n_blocks*n_words at 32k.
  * Ray data arrives pre-transposed as [n_steps, SB, 8] (rays along
    SUBLANES, components along lanes) so per-ray columns are free static
    views. The 16x lane padding of the minor dim costs ~100 µs of HBM
    traffic per 131k-ray wave — noise next to the relayouts it removes.
  * The traversal kernel proper is just: per B-ray block, a scalar-core
    bit-scan of the mask words (lowest-set-bit iteration, no branches),
    and ONE dense [B, 128] Möller-Trumbore block per listed cluster
    against VMEM-resident triangle rows (~540-860 ns each — the VPU issue
    rate for this dependency pattern). A packed (t, lane) int32 key tracks
    the per-ray nearest hit in a single reduction.

No per-candidate HBM traffic, no top_k, no sorts, no truncation: every
slab-hit cluster is tested, so the K1/K2 overflow of the XLA path is
structurally zero here.

Returns (t, prim) only; the winner's barycentrics/normals are recovered
outside by the shared one-gather re-test (render/trace.py). Global triangle
ids are identical between both traversal implementations (same BVH-DFS
order underneath). The t output carries ~2^-17 relative slack from the key
packing; exact t is re-derived by the winner re-test.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.kernel_tables import KTRI

SB = 2048  # rays per grid step
# rays per ray-block (mask granularity: one cluster MT block serves the
# UNION of its B rays' slab-hit clusters — smaller B = tighter unions but
# more scalar-core scans; env-tunable for hardware sweeps). Measured on
# v5e, stage-6 bench frames: 128 beats 256 by 1.2-1.6x (tighter unions
# dominate the extra scans) and beats 64/32 (42.1 / 132.8 vs 103 ms —
# per-block fixed costs overtake the union gains).
B = int(os.environ.get("RAYITO_TRAVERSE_B", "128"))
RB = SB // B  # ray-blocks per grid step
_INF = float("inf")  # python scalar: folds into kernel constants
_IMAX = jnp.iinfo(jnp.int32).max


def traversal_impl() -> str:
    """'pallas' | 'xla' — RAYITO_TRAVERSAL env overrides; auto picks the
    Pallas kernel on TPU and the XLA pipeline elsewhere (the kernel runs
    anywhere via the interpreter, but interpretation is only fast enough
    for tests)."""
    v = os.environ.get("RAYITO_TRAVERSAL", "auto").lower()
    if v in ("pallas", "xla"):
        return v
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# de Bruijn count-trailing-zeros for the scalar core (Mosaic has no scalar
# popcount/clz): for power-of-two x, DEBRUIJN_TABLE[(x * B) >>> 27] = log2(x)
_DEBRUIJN_MUL = 0x077CB531
_DEBRUIJN_TABLE = (
    0, 1, 28, 2, 29, 14, 24, 3, 30, 22, 20, 15, 25, 17, 4, 8,
    31, 27, 13, 23, 21, 19, 16, 7, 26, 12, 18, 6, 11, 5, 10, 9,
)


def _pack_key(t_f32, lane):
    """Order-preserving (t, lane) pack: positive-f32 bits sort as int32;
    the low 7 mantissa bits are replaced by the lane id, so the min over
    lanes picks the nearest triangle with ~2^-17 relative t slack on ties
    (the exact t is re-derived by the winner re-test outside the kernel)."""
    bits = pltpu.bitcast(t_f32, jnp.int32)
    return (bits & ~jnp.int32(KTRI - 1)) | lane


def _traverse_kernel(
    ctz_ref,  # scalar-prefetch [32] i32 de Bruijn ctz table
    mask_ref,  # [1, RB, n_words] i32 cluster bit-masks, SMEM block per step
    soat_ref,  # [1, SB, 8] f32: ox oy oz dx dy dz tmax pad, rays on sublanes
    tri_ref,  # [C, 16, KTRI] f32 triangle table (VMEM-resident)
    tout_ref, pout_ref,  # [1, SB, 1]
    kbest_ref, cbest_ref,  # [B, 1] i32 scratch
    *, n_words: int, tmin: float,
):
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, KTRI), 1)

    def ray_block(r, carry):  # fori_loop: ONE copy of the MT machinery
        # regardless of RB (a static python loop multiplied Mosaic compile
        # time by RB — >9 min at RB=16)
        lo = r * B
        rd = lambda k: soat_ref[0, pl.ds(lo, B), k : k + 1]
        ox, oy, oz = rd(0), rd(1), rd(2)
        dx, dy, dz = rd(3), rd(4), rd(5)
        tmax = rd(6)

        # clamp: inf tmax would pack to NaN bits (exponent all-ones)
        kbest_ref[:] = _pack_key(jnp.minimum(tmax, 3e38), jnp.int32(KTRI - 1))
        cbest_ref[:] = jnp.full((B, 1), -1, jnp.int32)

        def mt(c):
            rows = tri_ref[c]  # [16, 128] VMEM block
            v0x, v0y, v0z = rows[0:1], rows[1:2], rows[2:3]
            e1x, e1y, e1z = rows[3:4], rows[4:5], rows[5:6]
            e2x, e2y, e2z = rows[6:7], rows[7:8], rows[8:9]
            # classic Möller-Trumbore over [B, 128]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / det
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            kb = kbest_ref[:]
            tb = pltpu.bitcast(kb | jnp.int32(KTRI - 1), jnp.float32)
            # det==0 -> inv inf -> u/v/t inf or nan -> comparisons fail
            ok = (
                (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t >= tmin)
                & (t <= tb)
            )
            key = jnp.where(ok, _pack_key(t, lane), _IMAX)
            kmin = jnp.min(key, axis=1, keepdims=True)
            better = kmin < kb
            kbest_ref[:] = jnp.where(better, kmin, kb)
            cbest_ref[:] = jnp.where(better, c, cbest_ref[:])

        # scalar-core bit-scan of this block's cluster mask: iterate set
        # bits lowest-first, one unconditional MT block per set bit. The
        # word loop is a fori_loop so the MT body is inlined ONCE per
        # ray-block (a statically unrolled word loop multiplied Mosaic
        # compile time by n_words).
        def scan_word(w, carry):
            def has_bits(s):
                return s[1] != 0

            def next_bit(s):
                w, bits = s
                low = bits & -bits
                idx = jax.lax.shift_right_logical(
                    low * jnp.int32(_DEBRUIJN_MUL), 27
                )
                c = w * 32 + ctz_ref[idx]
                mt(c)
                return w, bits & (bits - 1)

            jax.lax.while_loop(has_bits, next_bit, (w, mask_ref[0, r, w]))
            return carry

        jax.lax.fori_loop(0, n_words, scan_word, 0)

        cb = cbest_ref[:]
        found = cb >= 0
        t_out = pltpu.bitcast(kbest_ref[:] & ~jnp.int32(KTRI - 1), jnp.float32)
        tout_ref[0, pl.ds(lo, B), :] = jnp.where(found, t_out, _INF)
        pout_ref[0, pl.ds(lo, B), :] = jnp.where(
            found, cb * KTRI + (kbest_ref[:] & jnp.int32(KTRI - 1)), -1
        )
        return carry

    jax.lax.fori_loop(0, RB, ray_block, 0)


@functools.partial(jax.jit, static_argnames=("tmin", "interpret"))
def _traverse_blocks(masks, soat, tri, tmin: float, interpret: bool):
    """masks: [n_blocks, n_words] i32; soat: [n_steps, SB, 8] f32.
    Returns (t, prim) each [n_steps, SB, 1].

    Masks ride as a pipelined per-step SMEM block, NOT a scalar-prefetch
    operand: prefetch materializes the whole array in SMEM at ~32 B per
    entry, which caps n_blocks*n_words at 32k entries (1 MB) — hit by both
    B=64 and merged 262k-ray occlusion launches."""
    n_steps = soat.shape[0]
    n_words = masks.shape[1]
    c = tri.shape[0]
    masks3 = masks.reshape(n_steps, RB, n_words)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, RB, n_words), lambda i, z: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, SB, 8), lambda i, z: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (c, 16, KTRI), lambda i, z: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, SB, 1), lambda i, z: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ) * 2,
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.int32),  # kbest (packed t|lane)
            pltpu.VMEM((B, 1), jnp.int32),  # cbest
        ],
    )
    ctz = jnp.asarray(_DEBRUIJN_TABLE, jnp.int32)
    return pl.pallas_call(
        functools.partial(_traverse_kernel, n_words=n_words, tmin=tmin),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, SB, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, SB, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ctz, masks3, soat, tri)


def _mask_kernel(
    soat_ref,  # [1, SB, 8] f32 rays (same layout as the traversal kernel)
    box_ref,  # [8, C_pad] f32 cluster slab rows
    pack_ref,  # [C_pad, 64] f32 bit-pack weights (lo 32 cols | hi 32 cols)
    out_ref,  # [1, RB, 64] f32 packed halves (lo | hi), combined outside
    *, tmin: float, n_words: int,
):
    """Per-ray-block cluster masks, VMEM-resident. The XLA version of this
    computation fused perfectly in isolation (1.74 ms/131k rays) but inside
    the full bounce-body jit XLA split it into ~7 fusions per traversal that
    materialize [N, C_pad] f32 intermediates through HBM — measured 78 of a
    113 ms band. Here every [B, C_pad] intermediate lives in VMEM.

    Bit-packing without lane relayouts: the [1, C_pad] any-hit row is
    matmul'd (MXU) against constant 0/2^k weights, 16 bits per half so every
    partial sum is an exact small integer in f32."""
    del n_words
    box = box_ref[...]

    def ray_block(r, carry):
        lo = r * B
        rd = lambda k: soat_ref[0, pl.ds(lo, B), k : k + 1]
        ox, oy, oz = rd(0), rd(1), rd(2)
        dx, dy, dz = rd(3), rd(4), rd(5)
        tmax = rd(6)
        ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        tx0 = (box[0:1, :] - ox) * ix
        ty0 = (box[1:2, :] - oy) * iy
        tz0 = (box[2:3, :] - oz) * iz
        tx1 = (box[3:4, :] - ox) * ix
        ty1 = (box[4:5, :] - oy) * iy
        tz1 = (box[5:6, :] - oz) * iz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        hit = (jnp.maximum(near, tmin) <= jnp.minimum(far, tmax)) & (
            far >= tmin
        )
        any_hit = jnp.max(hit.astype(jnp.float32), axis=0, keepdims=True)
        halves = jnp.dot(
            any_hit, pack_ref[...], preferred_element_type=jnp.float32
        )  # [1, 64]
        out_ref[0, pl.ds(r, 1), :] = halves
        return carry

    jax.lax.fori_loop(0, RB, ray_block, 0)


def _pack_weights(c_pad: int, n_words: int):
    """[C_pad, 64] f32: column w in [0,32) holds 2^(c%16) for clusters c
    with c//32==w and c%32<16 (low half); columns 32+w the high half."""
    import numpy as np

    wts = np.zeros((c_pad, 64), np.float32)
    for c in range(min(c_pad, n_words * 32)):
        w, b = divmod(c, 32)
        if b < 16:
            wts[c, w] = float(1 << b)
        else:
            wts[c, 32 + w] = float(1 << (b - 16))
    return jnp.asarray(wts)


@functools.partial(jax.jit, static_argnames=("tmin", "n_words", "interpret"))
def _block_masks_pallas(soat, cl_box, tmin: float, n_words: int,
                        interpret: bool):
    """soat: [n_steps, SB, 8] f32. Returns [n_blocks, n_words] i32 masks
    (same contract as _block_masks)."""
    n_steps = soat.shape[0]
    box = jnp.asarray(cl_box)
    c_pad = box.shape[1]
    wts = _pack_weights(c_pad, n_words)
    halves = pl.pallas_call(
        functools.partial(_mask_kernel, tmin=float(tmin), n_words=n_words),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, SB, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RB, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, RB, 64), jnp.float32),
        interpret=interpret,
    )(soat, box, wts)
    lo = halves[..., 0:32].astype(jnp.int32)
    hi = halves[..., 32:64].astype(jnp.int32)
    words = (lo | (hi << 16)).reshape(n_steps * RB, 32)
    return words[:, :n_words]


def _block_masks(ox, oy, oz, ix, iy, iz, tmin, tmax, cl_box, n_blocks):
    """XLA-side candidate selection: fused [N, C] slab test reduced to
    per-B-ray-block any-hit masks, bit-packed to [n_blocks, C/32] i32."""
    box = jnp.asarray(cl_box)
    c_pad = box.shape[1]
    r = lambda a: a[:, None]
    tx0 = (box[0:1, :] - r(ox)) * r(ix)
    ty0 = (box[1:2, :] - r(oy)) * r(iy)
    tz0 = (box[2:3, :] - r(oz)) * r(iz)
    tx1 = (box[3:4, :] - r(ox)) * r(ix)
    ty1 = (box[4:5, :] - r(oy)) * r(iy)
    tz1 = (box[5:6, :] - r(oz)) * r(iz)
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    hit = (jnp.maximum(near, tmin) <= jnp.minimum(far, r(tmax))) & (
        far >= tmin
    )
    blk_any = jnp.any(hit.reshape(n_blocks, B, c_pad), axis=1)
    n_words = -(-c_pad // 32)
    pad = n_words * 32 - c_pad
    if pad:
        blk_any = jnp.concatenate(
            [blk_any, jnp.zeros((n_blocks, pad), bool)], axis=1
        )
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    words = jnp.sum(
        jnp.where(blk_any.reshape(n_blocks, n_words, 32), weights, 0),
        axis=2,
        dtype=jnp.uint32,
    )
    return jax.lax.bitcast_convert_type(words, jnp.int32)


def _part1by2(x):
    """Spread the low 9 bits of x so they occupy every 3rd bit."""
    x = x & 0x1FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _coherence_key(ox, oy, oz, dx, dy, dz, tmax, cl_box, tmin):
    """Ray-sort key: (root-miss flag, morton cell of the root-box entry
    point, direction octant). Purely a performance heuristic — results are
    inverse-permuted so ANY key yields identical output; a good key packs
    rays with overlapping candidate-cluster sets into the same mask block.
    Root box derived from the cluster table (NEVER_HIT pad lanes stripped)."""
    rmin = jnp.min(cl_box[0:3], axis=1)
    mx = jnp.where(cl_box[3:6] >= 1e29, -jnp.float32(_INF), cl_box[3:6])
    rmax = jnp.max(mx, axis=1)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    tx0 = (rmin[0] - ox) * ix
    ty0 = (rmin[1] - oy) * iy
    tz0 = (rmin[2] - oz) * iz
    tx1 = (rmax[0] - ox) * ix
    ty1 = (rmax[1] - oy) * iy
    tz1 = (rmax[2] - oz) * iz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    live = (jnp.maximum(near, tmin) <= jnp.minimum(far, tmax)) & (tmax > tmin)
    tn = jnp.clip(near, 0.0, 3e38)
    ext = jnp.maximum(rmax - rmin, 1e-30)
    qx = jnp.clip((ox + dx * tn - rmin[0]) / ext[0] * 512.0, 0.0, 511.0)
    qy = jnp.clip((oy + dy * tn - rmin[1]) / ext[1] * 512.0, 0.0, 511.0)
    qz = jnp.clip((oz + dz * tn - rmin[2]) / ext[2] * 512.0, 0.0, 511.0)
    morton = (
        (_part1by2(qx.astype(jnp.int32)) << 2)
        | (_part1by2(qy.astype(jnp.int32)) << 1)
        | _part1by2(qz.astype(jnp.int32))
    )
    octant = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    # Octant in the HIGH bits: the packed 1-op sort keeps only the top 13
    # key bits, and grouping by direction octant first, then 9 morton bits
    # (8^3 entry cells), measured 22% fewer MT blocks on bounce rays
    # (p90 union 41 -> 15 clusters) vs morton-major keys that dropped the
    # octant entirely.
    key = (octant << 27) | morton
    return jnp.where(live, key, jnp.int32(1) << 30)


def traverse(o, d, tmax, tables, tmin: float, n_active=None,
             interpret: bool | None = None, sort_rays: bool | None = None,
             want_t: bool = True):
    """Nearest triangle hit for rays (o, d: V3 of [N]) against one kernel
    table set. tmax: [N]. Returns (t [N] f32 (INF on miss), prim [N] i32
    table-local triangle id or -1). With ``want_t=False`` t is returned as
    None and skipped from the inverse permutation (cheaper unsort) — for
    callers that re-derive exact t from the winning primitive anyway.

    ``sort_rays`` permutes the wavefront by a spatial-coherence key before
    blocking (tightening per-block cluster unions) and inverse-permutes the
    results — bit-identical output either way. Defaults on for compiled
    runs, off under the interpreter (tests exercise both).

    ``n_active`` is accepted for interface parity but unused: inactive /
    padded lanes carry tmax<=0, produce empty candidate masks, and cost
    only the fused XLA slab."""
    del n_active
    n = o.x.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sort_rays is None:
        sort_rays = not interpret
    n_steps = max(1, -(-n // SB))
    n_pad = n_steps * SB - n

    # Pack the whole ray SoA into ONE [Npad, 8] row array up front: the
    # sort permutation is then a single row gather (eight separate
    # per-component [N] gathers measured ~0.94 ms EACH on hardware — 4-byte
    # gather rows are the pathological case), and the packed form IS the
    # kernel's soat layout.
    f32 = jnp.float32
    soa8 = jnp.stack(
        [
            jnp.asarray(o.x, f32), jnp.asarray(o.y, f32),
            jnp.asarray(o.z, f32), jnp.asarray(d.x, f32),
            jnp.asarray(d.y, f32), jnp.asarray(d.z, f32),
            jnp.broadcast_to(jnp.asarray(tmax, f32), (n,)),
            jnp.zeros((n,), f32),
        ],
        axis=1,
    )
    if n_pad:
        pad_row = jnp.zeros((n_pad, 8), f32).at[:, 3:6].set(1.0)
        soa8 = jnp.concatenate([soa8, pad_row])  # tmax 0 -> no candidates

    col = lambda k: soa8[:, k]

    # Coherence sort: "global" sorts the whole wavefront (measured best —
    # incoherent bounce/shadow rays need global regrouping; a per-step
    # "step" sort is cheaper per pass but leaves each 2048-ray step's
    # blocks spanning the whole key range and lost 1.3-3.5x on hardware).
    perm_local = None
    mode = os.environ.get("RAYITO_TRAVERSE_SORT", "global")
    if not sort_rays:
        mode = "off"
    if mode != "off":
        key = _coherence_key(
            col(0), col(1), col(2), col(3), col(4), col(5), col(6),
            jnp.asarray(tables.cl_box), float(tmin),
        )
        n_tot = n_steps * SB
        if mode == "global":
            lane_ids = jnp.arange(n_tot, dtype=jnp.int32)
            if n_tot <= (1 << 17):
                # pack (coarse key, lane id) into ONE operand: a 1-op sort
                # is ~2x cheaper than 2-op. 13 coarse key bits (miss flag +
                # morton MSBs) give ~16-ray buckets at 131k lanes — far
                # finer than the B-ray block granularity that matters.
                packed = ((key >> 17) << 17) | lane_ids
                perm = jax.lax.sort(packed) & jnp.int32((1 << 17) - 1)
            else:
                _, perm = jax.lax.sort((key, lane_ids), num_keys=1)
        else:
            ids2 = jnp.broadcast_to(
                jnp.arange(SB, dtype=jnp.int32)[None, :], (n_steps, SB)
            )
            _, pl_ = jax.lax.sort(
                (key.reshape(n_steps, SB), ids2), dimension=1, num_keys=1
            )
            perm_local = pl_
            perm = (
                jnp.arange(n_steps, dtype=jnp.int32)[:, None] * SB + pl_
            ).reshape(-1)
        soa8 = soa8[perm]  # ONE row gather for all 8 components

    soat = soa8.reshape(n_steps, SB, 8)
    c_pad = jnp.asarray(tables.cl_box).shape[1]
    n_words = -(-c_pad // 32)
    if n_words <= 32:
        masks = _block_masks_pallas(
            soat, tables.cl_box, float(tmin), n_words, bool(interpret)
        )
    else:  # >1024 clusters: bit-pack weights don't fit one matmul — XLA path
        masks = _block_masks(
            col(0), col(1), col(2),
            1.0 / col(3), 1.0 / col(4), 1.0 / col(5),
            float(tmin), col(6), tables.cl_box, n_steps * RB,
        )

    t_bn, p_bn = _traverse_blocks(
        masks, soat, tables.tri, tmin=float(tmin), interpret=bool(interpret)
    )
    if mode == "off":
        t = t_bn.reshape(n_steps * SB)
        prim = p_bn.reshape(n_steps * SB)
    elif perm_local is not None:  # step mode: per-row inverse permutation
        ops = (perm_local, p_bn.reshape(n_steps, SB)) + (
            (t_bn.reshape(n_steps, SB),) if want_t else ()
        )
        outs = jax.lax.sort(ops, dimension=1, num_keys=1)
        prim = outs[1].reshape(n_steps * SB)
        t = outs[2].reshape(n_steps * SB) if want_t else None
    else:
        ops = (perm, p_bn.reshape(-1)) + (
            (t_bn.reshape(-1),) if want_t else ()
        )
        outs = jax.lax.sort(ops, num_keys=1)
        prim = outs[1]
        t = outs[2] if want_t else None
    return (t[:n] if t is not None else None), prim[:n]
