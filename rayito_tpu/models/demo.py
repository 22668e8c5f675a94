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
