"""tpurt — a TPU-native differentiable ray tracer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
project ``SoslanGM/gpu_raytracer`` (/root/reference/README.md:2 — "A learning
project about GPU-accelerated raytracing"), rebuilt TPU-first:

- Morton-code sort + Karras binary-radix LBVH build + AABB refit (``accel/``)
- Möller–Trumbore intersection, packet-coherent stackless traversal
  (``accel/``, ``kernels/`` for the Pallas TPU kernels)
- Lambertian shading with shadow rays (``render/``)
- End-to-end differentiability with soft-visibility silhouette gradients
  (``diff/``)
- Multi-chip/multi-host scaling via jax.sharding meshes and XLA collectives
  (``dist/``)
- User-facing ``Renderer`` / ``InverseRenderer`` APIs, config, checkpointing
  (``api/``), and a CLI (``cli/``).

Layer map and component inventory: /root/repo/SURVEY.md §1b, §2b.
"""

__version__ = "0.1.0"

from tpurt.core.geometry import (  # noqa: F401
    AABB,
    Camera,
    Hit,
    Rays,
    Triangles,
)
from tpurt.core.scene import Scene, make_cornell_box  # noqa: F401
