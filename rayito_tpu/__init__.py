"""rayito_tpu — a TPU-native (JAX/XLA/Pallas) path-tracing framework.

Brand-new implementation of the capabilities of neverhood311/Rayito
(reference mounted at /root/reference), redesigned for TPU: SoA ray
wavefronts, flat kind-segregated scenes, counter-based CMJ sampling,
skip-link BVH traversal, shard_map tile parallelism.
"""

__version__ = "0.1.0"

from .models.scene import (  # noqa: F401
    DiffuseMaterial,
    EmitterMaterial,
    GlossyMaterial,
    Group,
    PhongMaterial,
    Plane,
    RectangleLight,
    ReflectionMaterial,
    Scene,
    SceneData,
    ShapeLight,
    Sphere,
    Transform,
    TriangleMesh,
)
from .models.camera import PerspectiveCamera  # noqa: F401
from .utils.config import RenderConfig  # noqa: F401
