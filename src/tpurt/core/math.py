"""Math utilities, RNG, and dtype policy (SURVEY.md §2b #3).

Pure-JAX helpers shared by every layer above core.  No reference counterpart
exists (/root/reference is an empty stub, SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# dtype policy: f32 is the working precision for geometry (slab tests and
# Möller–Trumbore determinants are precision-sensitive); bf16 is opt-in for
# bandwidth-bound kernel paths.
# ---------------------------------------------------------------------------
COMPUTE_DTYPE = jnp.float32
STORAGE_DTYPE = jnp.float32


def dot(a: Array, b: Array, keepdims: bool = False) -> Array:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def norm(a: Array, keepdims: bool = False) -> Array:
    return jnp.sqrt(jnp.maximum(dot(a, a, keepdims=keepdims), 1e-30))


def normalize(a: Array) -> Array:
    return a / norm(a, keepdims=True)


def make_onb(n: Array) -> tuple[Array, Array, Array]:
    """Orthonormal basis from a (normalized) normal, branchless (Duff et al.).

    Returns (tangent, bitangent, n); all (..., 3).
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt, n


def reflect(d: Array, n: Array) -> Array:
    return d - 2.0 * dot(d, n, keepdims=True) * n


# ---------------------------------------------------------------------------
# RNG: counter-based threefry so every pixel/sample gets an independent,
# order-invariant stream — the TPU-native analogue of per-thread curand.
# ---------------------------------------------------------------------------
def pixel_rng(key: Array, pixel_index: Array) -> Array:
    """Derive a per-pixel key from a base key. pixel_index: (...,) int32."""
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        key, pixel_index.reshape(-1)
    ).reshape(*pixel_index.shape, *key.shape)


def sample_square(key: Array, shape: tuple[int, ...]) -> Array:
    """Jittered offsets in [0,1)^2 for AA: (..., 2)."""
    return jax.random.uniform(key, (*shape, 2), jnp.float32)


def smoothstep(e0: Array, e1: Array, x: Array) -> Array:
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def srgb_encode(linear: Array) -> Array:
    """Linear -> sRGB, for image output."""
    linear = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.power(jnp.maximum(linear, 1e-8), 1.0 / 2.4) - 0.055,
    )


def to_uint8(img: Array) -> Array:
    return jnp.clip(srgb_encode(img) * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
