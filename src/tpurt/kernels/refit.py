"""Pallas AABB refit kernel (SURVEY.md §2b #8 Pallas twin).

`accel/refit.py` recomputes node AABBs with O(depth) level-synchronous
gather/min/max passes — each pass is an XLA gather over the whole node array,
so a deep tree costs ~depth full-array HBM round trips.  This kernel does the
same refit in ONE pass: the packed flat BVH is in DFS preorder with escape
links, so a single REVERSE sweep visits children before parents and each
internal node is the union of exactly two already-computed rows:

    left child of i  = i + 1            (preorder)
    right child of i = escape[i + 1]    (first node after the left subtree)

Per node that is ~4 scalar loads + one (1, 8) vector min/max in VMEM — no
HBM traffic between levels, no gathers.  Leaf AABBs are computed in XLA from
the same gathered corners as accel/refit.py (bitwise-identical inputs), so
the kernel's output equals the reference refit exactly; the oracle test
(tests/oracle/test_refit_pallas.py) asserts it.

Scope: node arrays must fit VMEM (same tier rule as kernels/traverse.py);
the XLA path remains the default and the scale fallback.

DECISION (round 3, measured on v5e): **XLA** — this kernel fails Mosaic
compilation on hardware ("Cannot store scalars to VMEM"; its per-node
scalar stores are interpret-only, the same class as the retired binary
HBM tier), while the XLA refit paths run 20.4 ms (refit_packed) / 16.4 ms
(BVH8 refit_wide, the production fit path) per step at bunny 70K — far
off the fit step's critical path (the soft render is seconds).  The
kernel remains the interpret-mode reference for the one-pass reverse-DFS
formulation; api/inverse.py keeps the XLA refit.
No reference implementation exists to mirror (SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.accel.packet import LEAF_CAP, PackedBVH
from tpurt.core.geometry import Triangles

Array = jax.Array

BIG = jnp.float32(3.0e38)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _refit_kernel(ni, leaf_f32, out):
    """Reverse-DFS union sweep. ni: (M, 4) [escape, leaf_row, _, is_leaf];
    leaf_f32: (L, 8) [lo.xyz, hi.xyz, 0, 0]; out: (M, 8) node AABBs."""
    m = ni.shape[0]

    def body(k, _):
        i = m - 1 - k
        is_leaf = ni[i, 3] > 0

        @pl.when(is_leaf)
        def _():
            out[i, :] = leaf_f32[ni[i, 1], :]

        @pl.when(jnp.logical_not(is_leaf))
        def _():
            left = jnp.minimum(i + 1, m - 1)
            right = jnp.clip(ni[left, 0], 0, m - 1)  # escape of left child
            # scalar column ops: cols 0-2 lows (min), 3-5 highs (max)
            for c in range(3):
                out[i, c] = jnp.minimum(out[left, c], out[right, c])
            for c in range(3, 6):
                out[i, c] = jnp.maximum(out[left, c], out[right, c])
            out[i, 6] = jnp.float32(0.0)
            out[i, 7] = jnp.float32(0.0)

        return 0

    jax.lax.fori_loop(0, m, body, 0)


def leaf_aabbs(packed: PackedBVH, tris: Triangles) -> Array:
    """Per-leaf AABBs (L, 8) [lo|hi|0,0] from gathered corners through the
    frozen tri_ids topology — the same values accel/refit.py reduces, so the
    kernel's unions match the reference bitwise."""
    ids = packed.tri_ids  # (L, LEAF_CAP), -1 pads
    ok = ids >= 0
    g = jnp.maximum(ids, 0)
    f = tris.faces[g]  # (L, C, 3)
    v0 = tris.verts[f[..., 0]]
    v1 = tris.verts[f[..., 1]]
    v2 = tris.verts[f[..., 2]]
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    tri_lo = jnp.where(ok[..., None], tri_lo, BIG)
    tri_hi = jnp.where(ok[..., None], tri_hi, -BIG)
    lo = jnp.min(tri_lo, axis=1)  # (L, 3)
    hi = jnp.max(tri_hi, axis=1)
    return jnp.concatenate(
        [lo, hi, jnp.zeros((lo.shape[0], 2), jnp.float32)], axis=1
    )


def refit_packed_pallas(packed: PackedBVH, tris: Triangles) -> PackedBVH:
    """One-kernel refit of a packed BVH after vertices moved: new leaf rows
    regathered in XLA (dense), node AABBs by the fused reverse-DFS sweep."""
    leaf8 = leaf_aabbs(packed, tris)
    node_f32 = pl.pallas_call(
        _refit_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(packed.node_f32.shape, jnp.float32),
        interpret=_interpret(),
    )(packed.node_i32, leaf8)

    # new triangle rows (v0|e1|e2 slots) from the moved vertices
    ids = packed.tri_ids
    in_range = ids >= 0
    g = jnp.maximum(ids, 0)
    v0c, v1c, v2c = tris.corners()
    tv0 = jnp.where(in_range[..., None], v0c[g], 0.0)
    te1 = jnp.where(in_range[..., None], v1c[g] - v0c[g], 0.0)
    te2 = jnp.where(in_range[..., None], v2c[g] - v0c[g], 0.0)
    rows = jnp.concatenate([tv0, te1, te2], axis=-1).reshape(
        packed.num_leaves, LEAF_CAP * 9
    )
    rows = jnp.pad(rows, ((0, 0), (0, 128 - LEAF_CAP * 9)))
    return packed.replace(node_f32=node_f32, tri_rows=rows)
