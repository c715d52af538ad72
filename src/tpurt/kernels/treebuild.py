"""Pallas tree-build kernels (SURVEY.md §2b #7 Pallas twin).

Two kernels cover the build's compute stages the TPU can fuse profitably:

- `morton_codes_pallas`: quantize + magic-number bit interleave of triangle
  centroids as ONE VPU kernel over (8, 128) tiles — the fused equivalent of
  accel/morton.py's elementwise chain (same magic constants, same values).
- `radix_tree_pallas`: Karras-2012 per-node (direction, range, split) with
  the per-node binary searches running on the scalar core over VMEM-resident
  codes — one kernel instead of 62 fori_loop gather steps.  NOTE: for large
  N the XLA formulation (accel/lbvh.build_radix_tree) wins: its per-step
  gathers are vectorized where Mosaic must scalarize the data-dependent
  `codes[i + s*d]` loads.  The XLA path therefore stays the default; this
  kernel is the fused small-scene twin and the contract artifact, oracle-
  tested bitwise (tests/oracle/test_treebuild_pallas.py).

No reference implementation exists to mirror (SURVEY.md §0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.core.geometry import AABB
from tpurt.accel.morton import MORTON_BITS

Array = jax.Array

LANE = 128
SUB = 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Morton encode
# ---------------------------------------------------------------------------
def _expand(x):
    x = (x * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    x = (x * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    x = (x * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    x = (x * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return x


def _morton_kernel(px, py, pz, lo, inv, out):
    """One (8, 128) tile of centroids -> 30-bit Morton codes."""
    def q(p, c):
        x = (p[0] - lo[0, c]) * inv[0, c]
        x = jnp.clip(x, 0.0, 1.0 - 1e-7)
        return (x * (1 << MORTON_BITS)).astype(jnp.uint32)

    out[0] = (
        (_expand(q(px, 0)) << jnp.uint32(2))
        | (_expand(q(py, 1)) << jnp.uint32(1))
        | _expand(q(pz, 2))
    )


def morton_codes_pallas(points: Array, bounds: AABB) -> Array:
    """30-bit Morton codes of (N, 3) points within bounds; same values as
    accel/morton.morton3d (identical quantization + magic constants)."""
    n = points.shape[0]
    per = SUB * LANE
    pad = (-n) % per
    p = jnp.pad(points, ((0, pad), (0, 0)))
    t = p.shape[0] // per
    tiles = [p[:, c].reshape(t, SUB, LANE) for c in range(3)]
    lo = bounds.lo.reshape(1, 3)
    inv = (1.0 / jnp.maximum(bounds.hi - bounds.lo, 1e-12)).reshape(1, 3)
    spec = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _morton_kernel,
        grid=(t,),
        in_specs=[spec] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((t, SUB, LANE), jnp.uint32),
        interpret=_interpret(),
    )(*tiles, lo, inv)
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Karras radix tree
# ---------------------------------------------------------------------------
def _radix_kernel(codes, left_o, right_o, parent_o, *, n: int):
    """Per-internal-node range/split on the scalar core; codes VMEM-resident.

    Same delta definition as accel/lbvh._delta (index-bit tie-break for
    duplicate codes) and the same power-of-two search ladders, so outputs
    are bitwise identical to the XLA build.
    """
    big_neg = jnp.int32(-1)

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        ci = codes[i]
        cj = codes[jc]
        x = ci ^ cj
        ix = i.astype(jnp.uint32) ^ jc.astype(jnp.uint32)
        d = jnp.where(x == 0, 32 + jax.lax.clz(ix), jax.lax.clz(x)).astype(
            jnp.int32
        )
        return jnp.where(valid, d, big_neg)

    # initialize parents to -1 (root keeps it)
    def init_parent(k, _):
        parent_o[k] = jnp.int32(-1)
        return 0

    jax.lax.fori_loop(0, 2 * n - 1, init_parent, 0)

    def node(i, _):
        d_raw = delta(i, i + 1) - delta(i, i - 1)
        d = jnp.where(d_raw >= 0, jnp.int32(1), jnp.int32(-1))
        delta_min = delta(i, i - d)

        def l_bit(b, acc):
            cand = acc + jnp.left_shift(jnp.int32(1), jnp.int32(30) - b)
            ok = delta(i, i + cand * d) > delta_min
            return jnp.where(ok, cand, acc)

        l = jax.lax.fori_loop(0, 31, l_bit, jnp.int32(0))
        j = i + l * d
        delta_node = delta(i, j)

        def s_bit(b, acc):
            cand = acc + jnp.left_shift(jnp.int32(1), jnp.int32(30) - b)
            ok = (cand <= l - 1) & (delta(i, i + cand * d) > delta_node)
            return jnp.where(ok, cand, acc)

        s = jax.lax.fori_loop(0, 31, s_bit, jnp.int32(0))
        gamma = i + s * d + jnp.minimum(d, 0)

        lo_ij = jnp.minimum(i, j)
        hi_ij = jnp.maximum(i, j)
        leaf_base = jnp.int32(n - 1)
        left = jnp.where(lo_ij == gamma, leaf_base + gamma, gamma)
        right = jnp.where(hi_ij == gamma + 1, leaf_base + gamma + 1, gamma + 1)
        left_o[i] = left
        right_o[i] = right
        parent_o[left] = i
        parent_o[right] = i
        return 0

    jax.lax.fori_loop(0, n - 1, node, 0)


def radix_tree_pallas(codes: Array):
    """(left, right, parent) of the Karras radix tree over sorted codes."""
    n = codes.shape[0]
    out = pl.pallas_call(
        functools.partial(_radix_kernel, n=n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n - 1,), jnp.int32),
            jax.ShapeDtypeStruct((n - 1,), jnp.int32),
            jax.ShapeDtypeStruct((2 * n - 1,), jnp.int32),
        ],
        interpret=_interpret(),
    )(codes)
    return out
