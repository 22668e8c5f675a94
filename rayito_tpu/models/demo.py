"""The reference demo scenes, rebuilt as data.

Each function returns (scene: SceneData builder already compiled, plus the
camera/config used by that stage's golden render). Scene constants are
extracted from the stage main()s / MainWindow click handlers — cited inline.
"""

from __future__ import annotations

from .scene import (
    DiffuseMaterial,
    GlossyMaterial,
    PhongMaterial,
    Plane,
    RectangleLight,
    Scene,
    ShapeLight,
    Sphere,
)


def stage1_scene() -> Scene:
    """Pink plane at y=-2 (Rayito_Stage1/main.cpp:70-74). No bullseye."""
    s = Scene()
    s.add(
        Plane(
            position=(0.0, -2.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=DiffuseMaterial((1.0, 0.5, 0.8)),
        )
    )
    return s


STAGE1_CAMERA = ((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0))
STAGE1_FOV = 30.0


def stage2_scene() -> Scene:
    """White bullseye plane + two rect lights (Rayito_Stage2/main.cpp:96-118)."""
    s = Scene()
    s.add(
        Plane(
            position=(0.0, -2.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=DiffuseMaterial((1.0, 1.0, 1.0)),
            bullseye=True,
        )
    )
    s.add(
        RectangleLight(
            corner=(-2.5, 2.0, -2.5),
            side1=(5.0, 0.0, 0.0),
            side2=(0.0, 0.0, 5.0),
            color=(1.0, 0.5, 1.0),
            power=3.0,
        )
    )
    s.add(
        RectangleLight(
            corner=(-2.0, -1.0, -2.0),
            side1=(4.0, 0.0, 0.0),
            side2=(0.0, 0.0, 4.0),
            color=(1.0, 1.0, 0.5),
            power=0.75,
        )
    )
    return s


STAGE23_CAMERA = ((0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
STAGE23_FOV = 45.0


def stage5_scene() -> Scene:
    """Stage-5 GUI demo scene: bullseye plane, 4 spheres (2 lambert, 2 glossy),
    3×3 rect light power 5, sphere ShapeLight power 10
    (Rayito_Stage5_QT/MainWindow.cpp:37-89)."""
    s = Scene()
    blueish = DiffuseMaterial((0.7, 0.7, 0.9))
    purplish = DiffuseMaterial((0.8, 0.3, 0.7))
    yellowish = DiffuseMaterial((0.7, 0.7, 0.2))
    bluish_glossy = GlossyMaterial((0.5, 0.3, 0.8), 0.3)
    greenish_glossy = GlossyMaterial((0.3, 0.9, 0.3), 0.1)
    s.add(
        Plane(
            position=(0.0, -2.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=blueish,
            bullseye=True,
        )
    )
    s.add(Sphere(position=(3.0, -1.0, 0.0), radius=1.0, material=purplish))
    s.add(Sphere(position=(-3.0, 0.0, -2.0), radius=2.0, material=greenish_glossy))
    s.add(Sphere(position=(1.5, -1.5, 2.5), radius=0.5, material=bluish_glossy))
    s.add(Sphere(position=(-2.0, -1.5, 1.0), radius=0.5, material=yellowish))
    s.add(
        RectangleLight(
            corner=(-1.5, 4.0, -1.5),
            side1=(3.0, 0.0, 0.0),
            side2=(0.0, 0.0, 3.0),
            color=(1.0, 1.0, 1.0),
            power=5.0,
        )
    )
    s.add(
        ShapeLight(
            Sphere(position=(0.0, 0.5, 2.0), radius=0.5, material=blueish),
            color=(1.0, 1.0, 0.3),
            power=10.0,
        )
    )
    return s


STAGE5_CAMERA = ((0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))


def inline_box_mesh(material):
    """The hand-built 8-vertex open box of the stage-6/7 scenes
    (Rayito_Stage6_QT/MainWindow.cpp:77-120): 6 quad faces (one duplicated),
    no normals."""
    import numpy as np

    from .scene import TriangleMesh

    verts = np.array(
        [
            [0.0, -2.0, -2.0],
            [1.0, -2.0, -2.0],
            [1.0, -1.0, -2.0],
            [0.0, -1.0, -2.0],
            [0.0, -2.0, -1.0],
            [1.0, -2.0, -1.0],
            [1.0, -1.0, -1.0],
            [0.0, -1.0, -1.0],
        ],
        np.float32,
    )
    quads = [
        (0, 1, 2, 3),
        (1, 5, 6, 2),
        (5, 4, 7, 6),
        (4, 0, 3, 7),
        (3, 2, 6, 7),
        (3, 2, 6, 7),  # duplicated face, as in the reference
    ]
    tris, fids = [], []
    for fid, (a, b, c, d) in enumerate(quads):
        tris.append((a, b, c))
        tris.append((a, c, d))
        fids += [fid, fid]
    return TriangleMesh(
        vertices=verts,
        indices=np.array(tris, np.int32),
        material=material,
        face_ids=np.array(fids, np.int32),
    )


def stage6_scene(obj_path: str = "/root/reference/models/bumpy.obj") -> Scene:
    """Stage-6 GUI demo scene: stage-5 spheres + inline box mesh + bumpy.obj
    (glossy red), light sphere moved to (1, 0.5, 2)
    (Rayito_Stage6_QT/MainWindow.cpp:37-145)."""
    from .obj import load_obj

    s = Scene()
    blueish = DiffuseMaterial((0.7, 0.7, 0.9))
    purplish = DiffuseMaterial((0.8, 0.3, 0.7))
    yellowish = DiffuseMaterial((0.7, 0.7, 0.2))
    bluish_glossy = GlossyMaterial((0.5, 0.3, 0.8), 0.3)
    greenish_glossy = GlossyMaterial((0.3, 0.9, 0.3), 0.1)
    reddish_lambert = DiffuseMaterial((0.8, 0.3, 0.1))
    reddish_glossy = GlossyMaterial((0.8, 0.1, 0.1), 0.3)
    s.add(Plane((0.0, -2.0, 0.0), (0.0, 1.0, 0.0), blueish, bullseye=True))
    s.add(Sphere((3.0, -1.0, 0.0), 1.0, purplish))
    s.add(Sphere((-3.0, 0.0, -2.0), 2.0, greenish_glossy))
    s.add(Sphere((1.5, -1.5, 2.5), 0.5, bluish_glossy))
    s.add(Sphere((-2.0, -1.5, 1.0), 0.5, yellowish))
    s.add(inline_box_mesh(reddish_lambert))
    obj = load_obj(obj_path, reddish_glossy)
    if obj is not None:
        s.add(obj)
    s.add(
        RectangleLight(
            corner=(-1.5, 4.0, -1.5),
            side1=(3.0, 0.0, 0.0),
            side2=(0.0, 0.0, 3.0),
            color=(1.0, 1.0, 1.0),
            power=5.0,
        )
    )
    s.add(
        ShapeLight(
            Sphere((1.0, 0.5, 2.0), 0.5, blueish),
            color=(1.0, 1.0, 0.3),
            power=10.0,
        )
    )
    return s


STAGE6_CAMERA = ((-2.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))


def big_streamed_scene(
    obj_path: str = "/root/reference/models/bumpy.obj",
) -> Scene:
    """Scale stressor (no reference analogue — exercises the streamed
    cluster-chunk kernel, BENCH_NOTES.md "Big-scene datapoint"): 5 shifted
    bumpy.obj instances (~245k triangles, ~1900 clusters, ONE merged
    world-space traversal domain whose table streams through VMEM in
    TRI_CHUNK-cluster blocks) over a ground plane under one area light.
    Tracked as a bench.py extra so the design's worst number — union
    density across overlapping instances — cannot silently regress."""
    import numpy as np

    from .obj import load_obj
    from .scene import TriangleMesh

    mesh0 = load_obj(obj_path, DiffuseMaterial((0.5, 0.5, 0.5)))
    if mesh0 is None:
        raise FileNotFoundError(obj_path)
    verts = np.asarray(mesh0.vertices, np.float32)
    idx = np.asarray(mesh0.indices, np.int32)
    s = Scene()
    s.add(Plane((0.0, -2.0, 0.0), (0.0, 1.0, 0.0),
                DiffuseMaterial((0.7, 0.7, 0.7))))
    mats = [DiffuseMaterial((0.8, 0.3, 0.2)),
            GlossyMaterial((0.3, 0.7, 0.3), 0.25),
            DiffuseMaterial((0.3, 0.3, 0.8)),
            GlossyMaterial((0.8, 0.8, 0.2), 0.15),
            DiffuseMaterial((0.7, 0.4, 0.7))]
    offs = [(-5.0, 0, 0), (-2.5, 1.0, -2.0), (0.0, 0, 0),
            (2.5, 1.0, -2.0), (5.0, 0, 0)]
    for off, mat in zip(offs, mats):
        s.add(TriangleMesh(
            vertices=verts + np.asarray(off, np.float32),
            indices=idx, material=mat,
            normals=mesh0.normals, normal_indices=mesh0.normal_indices,
        ))
    s.add(RectangleLight((-4, 10, -4), (8, 0, 0), (0, 0, 8),
                         (1.0, 1.0, 1.0), 3.0))
    return s


def stage3_scene() -> Scene:
    """Bullseye plane, lambert+phong spheres, rect light, sphere ShapeLight
    (Rayito_Stage3/main.cpp:164-201). Stage 4's scene is identical
    (Rayito_Stage4/main.cpp)."""
    s = Scene()
    blueish = DiffuseMaterial((0.9, 0.9, 1.0))
    purplish = DiffuseMaterial((0.9, 0.7, 0.8))
    greenish = PhongMaterial((0.7, 0.9, 0.7), 16.0)
    s.add(
        Plane(
            position=(0.0, -2.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=blueish,
            bullseye=True,
        )
    )
    s.add(Sphere(position=(3.0, -1.0, 0.0), radius=1.0, material=purplish))
    s.add(Sphere(position=(-3.0, 0.0, -2.0), radius=2.0, material=greenish))
    s.add(
        RectangleLight(
            corner=(-2.5, 4.0, -2.5),
            side1=(5.0, 0.0, 0.0),
            side2=(0.0, 0.0, 5.0),
            color=(1.0, 1.0, 1.0),
            power=1.0,
        )
    )
    s.add(
        ShapeLight(
            Sphere(position=(0.0, 0.0, 2.0), radius=1.0, material=blueish),
            color=(1.0, 1.0, 0.1),
            power=4.0,
        )
    )
    return s


# ---------------------------------------------------------------------------
# Stage 7: keyed transforms, motion blur
# ---------------------------------------------------------------------------


def _axis_angle(axis, angle):
    """Host-side axis-angle quaternion (w, x, y, z), normalized axis."""
    import math

    import numpy as np

    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    h = angle * 0.5
    s = math.sin(h)
    return (math.cos(h), a[0] * s, a[1] * s, a[2] * s)


def make_cube(material):
    """Unit cube mesh of the stage-7 scenes (Rayito_Stage7_QT/MainWindow.cpp:
    93-137): 8 vertices at [0,1]^3, 6 quad faces with the last duplicated."""
    import numpy as np

    from .scene import TriangleMesh

    verts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        np.float32,
    )
    quads = [
        (0, 1, 2, 3),
        (1, 5, 6, 2),
        (5, 4, 7, 6),
        (4, 0, 3, 7),
        (3, 2, 6, 7),
        (3, 2, 6, 7),  # duplicated face, as in the reference
    ]
    tris, fids = [], []
    for fid, (a, b, c, d) in enumerate(quads):
        tris += [(a, b, c), (a, c, d)]
        fids += [fid, fid]
    return TriangleMesh(
        vertices=verts,
        indices=np.array(tris, np.int32),
        material=material,
        face_ids=np.array(fids, np.int32),
    )


def stage7_scene1(obj_path: str = "/root/reference/models/bumpy.obj") -> Scene:
    """Stage-7 demo scene 1 (Rayito_Stage7_QT/MainWindow.cpp:139-236):
    keyed TRS transforms on every shape, translating sphere (motion blur),
    rotating cube and bumpy meshes, 4-key animated sphere ShapeLight.

    Quirk note (SURVEY §2.11.5): the reference's concatenating rotate() uses
    an aliasing-bugged quaternion *=; we bake the CORRECT resulting keys
    (no stage-7 golden exists, so divergence is acceptable and documented;
    ops/quaternion.multiply_buggy is available for oracle comparisons).
    """
    import math

    from .obj import load_obj
    from .scene import Transform

    s = Scene()
    blueish = DiffuseMaterial((0.6, 0.6, 0.9))
    purplish = DiffuseMaterial((0.8, 0.3, 0.7))
    reddish = DiffuseMaterial((0.8, 0.3, 0.1))
    bluish_glossy = GlossyMaterial((0.5, 0.3, 0.8), 0.3)
    greenish_glossy = GlossyMaterial((0.3, 0.9, 0.3), 0.1)
    reddish_glossy = GlossyMaterial((0.8, 0.1, 0.1), 0.3)
    from .scene import ReflectionMaterial

    reflective = ReflectionMaterial((0.7, 0.7, 0.2))

    s.add(
        Plane(
            (0.0, 0.0, 0.0),
            (0.0, 1.0, 0.0),
            blueish,
            bullseye=True,
            transform=Transform(times=[0.0], translations=[(0.0, -2.0, 0.0)]),
        )
    )
    # translating sphere: keys at t=0 and t=1 (motion blur)
    s.add(
        Sphere(
            (0.0, 0.0, 0.0),
            1.0,
            purplish,
            transform=Transform(
                times=[0.0, 1.0],
                translations=[(2.0, -1.0, 0.0), (3.0, -1.0, 0.0)],
                scales=[(1.0, 1.0, 1.0)] * 2,
                rotations=[(1.0, 0.0, 0.0, 0.0)] * 2,
            ),
        )
    )
    s.add(
        Sphere(
            (0.0, 0.0, 0.0), 2.0, greenish_glossy,
            transform=Transform(times=[0.0], translations=[(-3.0, 0.0, -2.0)]),
        )
    )
    s.add(
        Sphere(
            (0.0, 0.0, 0.0), 0.5, bluish_glossy,
            transform=Transform(times=[0.0], translations=[(1.5, -1.5, 2.5)]),
        )
    )
    s.add(
        Sphere(
            (0.0, 0.0, 0.0), 0.5, reflective,
            transform=Transform(times=[0.0], translations=[(-2.0, -1.5, 1.0)]),
        )
    )
    # cube: static translation, rotating 45 deg about Y over the shutter
    cube = make_cube(reddish)
    cube.transform = Transform(
        times=[0.0, 1.0],
        translations=[(0.0, -2.0, -2.0)] * 2,
        scales=[(1.0, 1.0, 1.0)] * 2,
        rotations=[
            (1.0, 0.0, 0.0, 0.0),
            _axis_angle((0, 1, 0), math.pi / 4),
        ],
    )
    s.add(cube)
    obj = load_obj(obj_path, reddish_glossy)
    if obj is not None:
        obj.transform = Transform(
            times=[0.0, 0.5, 1.0],
            translations=[(0.2, 0.0, 0.0)] * 3,
            scales=[(1.0, 1.0, 1.0)] * 3,
            rotations=[
                (1.0, 0.0, 0.0, 0.0),
                _axis_angle((0, 1, 0), math.pi / 4),
                _axis_angle((0, 1, 0), 3 * math.pi / 4),
            ],
        )
        s.add(obj)
    s.add(
        RectangleLight(
            corner=(0.0, 0.0, 0.0),
            side1=(3.0, 0.0, 0.0),
            side2=(0.0, 0.0, 3.0),
            color=(1.0, 1.0, 1.0),
            power=5.0,
            transform=Transform(times=[0.0], translations=[(-1.5, 4.0, -1.5)]),
        )
    )
    # 4-key animated tiny sphere light, power 100
    s.add(
        ShapeLight(
            Sphere(
                (0.0, 0.0, 0.0), 0.1, blueish,
                transform=Transform(
                    times=[0.0, 0.33, 0.67, 1.0],
                    translations=[
                        (0.0, 0.5, 4.0),
                        (0.0, 1.5, 4.0),
                        (1.0, 1.5, 4.0),
                        (1.0, 0.5, 4.0),
                    ],
                    scales=[(1.0, 1.0, 1.0)] * 4,
                    rotations=[(1.0, 0.0, 0.0, 0.0)] * 4,
                ),
            ),
            color=(1.0, 1.0, 0.3),
            power=100.0,
        )
    )
    return s


STAGE7_CAMERA = ((-4.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))


def kinematic_position(start, velocity, time, gravity=(0.0, -9.8, 0.0),
                       ground_height: float = 0.0):
    """Closed-form gravity + single-bounce kinematics
    (Rayito_Stage7_QT/MainWindow.cpp:249-287)."""
    import numpy as np

    start = np.asarray(start, np.float64)
    velocity = np.asarray(velocity, np.float64)
    gravity = np.asarray(gravity, np.float64)
    up = -gravity / np.linalg.norm(gravity)
    v_up = velocity @ up
    p_up = start @ up
    a_up = -np.linalg.norm(gravity)
    disc = v_up * v_up - 2.0 * a_up * p_up
    if disc > 0.0:
        t_hit = (-v_up - np.sqrt(disc)) / a_up
        if t_hit < time:
            isect = start + velocity * t_hit + gravity * (t_hit * t_hit * 0.5)
            v_hit = velocity + gravity * t_hit
            v_reb = v_hit - 2.0 * up * (v_hit @ up)
            t_reb = time - t_hit
            return tuple(isect + v_reb * t_reb + gravity * (t_reb * t_reb * 0.5))
    return tuple(start + velocity * time + gravity * (time * time * 0.5))


def stage7_scene2() -> Scene:
    """Stage-7 demo scene 2 (Rayito_Stage7_QT/MainWindow.cpp:289-385):
    10 kinematically bouncing spheres + 10 tumbling cubes, all motion-blurred
    with 2-key transforms; rect light power 50."""
    import math

    from .scene import Transform

    s = Scene()
    blueish = DiffuseMaterial((0.6, 0.6, 0.9))
    yellowish_glossy = GlossyMaterial((0.9, 0.9, 0.3), 0.3)
    red = DiffuseMaterial((1.0, 0.2, 0.2))
    s.add(Plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), red, bullseye=True))

    dt = 0.2
    t_off = 0.0
    for i in range(10):
        p0 = kinematic_position((-10.0, 10.0, 0.0), (4.5, 0.0, 0.0), t_off)
        p1 = kinematic_position((-10.0, 10.0, 0.0), (4.5, 0.0, 0.0), t_off + dt)
        s.add(
            Sphere(
                (0.0, 0.0, 0.0), 1.0, blueish,
                transform=Transform(
                    times=[0.0, 1.0],
                    translations=[p0, p1],
                    scales=[(1.0, 1.0, 1.0)] * 2,
                    rotations=[(1.0, 0.0, 0.0, 0.0)] * 2,
                ),
            )
        )
        t_off += dt * 2.0

    t_off = 0.0
    for i in range(10):
        p0 = kinematic_position((10.0, 10.0, 2.0), (-4.5, 0.0, 0.0), t_off)
        p1 = kinematic_position((10.0, 10.0, 2.0), (-4.5, 0.0, 0.0), t_off + dt)
        rot0 = t_off * math.pi * 0.5
        if rot0 > math.pi * 2.0:
            rot0 -= math.pi * 2.0
        rot1 = rot0 + dt * math.pi * 0.5
        cube = make_cube(yellowish_glossy)
        cube.transform = Transform(
            times=[0.0, 1.0],
            translations=[p0, p1],
            scales=[(1.0, 1.0, 1.0)] * 2,
            rotations=[
                _axis_angle((1.0, 0.0, 1.0), rot0),
                _axis_angle((1.0, 0.0, 1.0), rot1),
            ],
        )
        s.add(cube)
        t_off += dt * 2.0

    s.add(
        RectangleLight(
            corner=(0.0, 0.0, 0.0),
            side1=(2.0, 0.0, 0.0),
            side2=(0.0, 0.0, 2.0),
            color=(1.0, 1.0, 1.0),
            power=50.0,
            transform=Transform(times=[0.0], translations=[(-1.0, 15.0, 1.0)]),
        )
    )
    return s


STAGE7_SCENE2_CAMERA = ((-4.0, 10.0, 30.0), (0.0, 5.0, 0.0), (0.0, 1.0, 0.0))
