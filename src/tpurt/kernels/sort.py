"""Pallas radix sort for (morton code, index) pairs (SURVEY.md §2b #6).

LSD radix sort, 8-bit digits, 4 passes.  Per pass the TPU-parallel work —
per-block digit histograms and stable in-block ranks — runs as ONE fused
Pallas kernel over a grid of key blocks (vector one-hot/cumsum math on the
VPU, no scalar loops); the tiny global exclusive scan over the (256 x
n_blocks) histogram matrix and the final destination scatter are XLA ops
(TPU scatter is a tuned native op; re-deriving it element-by-element with
scalar VMEM stores measured ~100x slower in Mosaic, so the kernel keeps the
vector work and hands XLA the permutation apply).

`sort_pairs(backend="pallas")` (accel/sort_ref.py) dispatches here — the
branch round 1 left as a latent ImportError (VERDICT r1 missing #2).  The
backend choice between this and `lax.sort_key_val` is made by measurement
(SURVEY.md §7 "#6: decide by benchmark, keep both behind one interface").

DECISION (round 3, measured on v5e): **XLA** — `lax.sort_key_val` does
646/348 Mkeys/s at 1M/5M keys on-chip, putting the Morton sort ~2 ms into
a 1M-tri build (nowhere near critical); this kernel's rank pass cannot
currently lower on hardware at all (`cumsum` is unimplemented in the
Mosaic TC pipeline — jax 0.9.0; a roll-based prefix emulation would be
~20x slower than XLA and was not worth building).  The kernel remains the
interpret-mode reference implementation behind the same interface.

Oracle tests: tests/oracle/test_sort_pallas.py (vs accel/sort_ref.py and
jnp.argsort, including adversarial all-duplicate keys).
No reference implementation exists to mirror (SURVEY.md §0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

RADIX_BITS = 8
RADIX = 1 << RADIX_BITS  # 256
BLK = 2048  # keys per grid block (16 sublane rows of 128 lanes)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _hist_rank_kernel(keys_ref, hist_ref, rank_ref, *, shift: int):
    """Per-block digit histogram + stable in-block rank.

    keys block (BLK,) laid out (BLK//128, 128); one-hot against the 256
    digit values -> histogram by column-sum, rank by exclusive cumsum in
    key order.  Everything is dense (BLK, RADIX) vector math.
    """
    rows = BLK // 128
    keys = keys_ref[...]  # (rows, 128) uint32
    digit = ((keys >> jnp.uint32(shift)) & jnp.uint32(RADIX - 1)).astype(jnp.int32)
    # one-hot over digits, laid out (BLK, RADIX) in KEY order: row-major
    # (rows, 128) -> (BLK, 1) against (1, RADIX)
    flat = digit.reshape(BLK, 1)
    vals = jax.lax.broadcasted_iota(jnp.int32, (1, RADIX), 1)
    onehot = (flat == vals).astype(jnp.int32)  # (BLK, RADIX)
    # counts live in row 0 of an (8, RADIX) block: Mosaic requires the
    # second-to-last block dim to be a multiple of 8 (a (1, RADIX) block
    # fails to compile on hardware — round-3 on-chip sort bench)
    counts = jnp.sum(onehot, axis=0, keepdims=True)  # (1, RADIX)
    hist_ref[...] = jnp.pad(counts, ((0, 7), (0, 0)))
    # stable rank of key i within its digit bucket = #earlier keys with the
    # same digit = exclusive cumsum of the one-hot along keys
    ranks = jnp.cumsum(onehot, axis=0) - onehot  # (BLK, RADIX)
    rank = jnp.sum(jnp.where(onehot > 0, ranks, 0), axis=1)  # (BLK,)
    rank_ref[...] = rank.reshape(rows, 128)


def _pass_pallas(keys: Array, vals: Array, shift: int) -> tuple[Array, Array]:
    """One stable counting-sort pass on digit (keys >> shift) & 0xff."""
    n = keys.shape[0]
    n_blocks = pl.cdiv(n, BLK)
    pad = n_blocks * BLK - n
    if pad:
        # pad with 0xFFFFFFFF so pads sort to the end within every pass
        keys_p = jnp.concatenate([keys, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
        vals_p = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
    else:
        keys_p, vals_p = keys, vals
    rows = BLK // 128
    keys2d = keys_p.reshape(n_blocks * rows, 128)

    hist, rank = pl.pallas_call(
        functools.partial(_hist_rank_kernel, shift=shift),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((8, RADIX), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * 8, RADIX), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * rows, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(keys2d)
    hist = hist[::8]  # counts are row 0 of each (8, RADIX) block

    # global digit-major exclusive scan: offset of (digit g, block b) =
    # all counts of digits < g anywhere + counts of digit g in blocks < b
    dm = hist.T.reshape(-1)  # (RADIX * n_blocks,) digit-major
    starts = (jnp.cumsum(dm) - dm).reshape(RADIX, n_blocks)

    digit = ((keys_p >> jnp.uint32(shift)) & jnp.uint32(RADIX - 1)).astype(jnp.int32)
    block = jnp.arange(n_blocks * BLK, dtype=jnp.int32) // BLK
    dest = starts[digit, block] + rank.reshape(-1)
    out_keys = jnp.zeros_like(keys_p).at[dest].set(keys_p)
    out_vals = jnp.zeros_like(vals_p).at[dest].set(vals_p)
    return out_keys[:n], out_vals[:n]


def radix_sort_pallas(keys: Array, vals: Array | None = None, num_bits: int = 32):
    """Stable LSD radix sort of uint32 keys (+ carried int32 values).

    Returns (sorted_keys, sorted_vals); same contract as
    accel/sort_ref.radix_sort_ref, Pallas-accelerated histogram/rank.
    """
    keys = keys.astype(jnp.uint32)
    if vals is None:
        vals = jnp.arange(keys.shape[0], dtype=jnp.int32)
    if keys.shape[0] == 0:
        return keys, vals
    for shift in range(0, num_bits, RADIX_BITS):
        keys, vals = _pass_pallas(keys, vals, shift)
    return keys, vals
