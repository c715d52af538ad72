"""Radix sort — pure-JAX reference + production interface (SURVEY.md §2b #5).

`radix_sort_ref` is a jittable LSD radix sort built from stable counting
sorts (histogram + exclusive scan + rank scatter) — the correctness oracle
for the Pallas one-sweep kernel (kernels/sort.py) and an executable spec of
the algorithm the TPU kernel implements.

`sort_pairs` is the production entry point behind which the backend is
chosen (SURVEY.md §7 "#6": decide by benchmark, keep both behind one
interface): XLA's native `lax.sort_key_val` (highly tuned on TPU), the
reference radix sort, or the Pallas kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

RADIX_BITS = 8
RADIX = 1 << RADIX_BITS


def _counting_pass(keys: Array, vals: Array, shift: int) -> tuple[Array, Array]:
    """One stable counting-sort pass on digit (keys >> shift) & 0xff."""
    digit = (keys >> jnp.uint32(shift)) & jnp.uint32(RADIX - 1)
    # Histogram via segment_sum over digit ids.
    ones = jnp.ones_like(digit, dtype=jnp.int32)
    hist = jax.ops.segment_sum(ones, digit.astype(jnp.int32), num_segments=RADIX)
    # Exclusive prefix sum -> first output slot of each digit bucket.
    bucket_start = jnp.cumsum(hist) - hist
    # Stable rank of each element within its bucket: number of earlier
    # elements with the same digit. one-hot cumsum formulation, O(N*RADIX)
    # flops but fully vectorized (this is the *reference*; the kernel does a
    # real block-scan).
    onehot = (digit[:, None] == jnp.arange(RADIX, dtype=jnp.uint32)[None, :])
    within = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
    rank_in_bucket = jnp.take_along_axis(
        within, digit[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    dest = bucket_start[digit.astype(jnp.int32)] + rank_in_bucket
    out_keys = jnp.zeros_like(keys).at[dest].set(keys)
    out_vals = jnp.zeros_like(vals).at[dest].set(vals)
    return out_keys, out_vals


def radix_sort_ref(keys: Array, vals: Array | None = None, num_bits: int = 32):
    """Stable LSD radix sort of uint32 keys (and carried values).

    Returns (sorted_keys, sorted_vals). O(N*256) work per 8-bit pass —
    reference implementation for oracle tests, not the fast path.
    """
    keys = keys.astype(jnp.uint32)
    if vals is None:
        vals = jnp.arange(keys.shape[0], dtype=jnp.int32)
    for shift in range(0, num_bits, RADIX_BITS):
        keys, vals = _counting_pass(keys, vals, shift)
    return keys, vals


def sort_pairs(keys: Array, vals: Array, backend: str = "xla"):
    """Sort (keys, vals) by key ascending. backend: 'xla' | 'ref'.

    'xla' (lax.sort_key_val) is the measured production path: 646/348
    Mkeys/s at 1M/5M keys on v5e.  The Pallas radix kernel was retired in
    round 4 (Mosaic cumsum gap + a ~25 Mkeys/s scatter-apply ceiling) —
    decision record: docs/RETIRED.md."""
    if backend == "xla":
        return jax.lax.sort_key_val(keys, vals)
    if backend == "ref":
        return radix_sort_ref(keys, vals)
    if backend == "pallas":
        raise ValueError(
            "the Pallas radix sort was retired (docs/RETIRED.md); "
            "use backend='xla'"
        )
    raise ValueError(backend)
