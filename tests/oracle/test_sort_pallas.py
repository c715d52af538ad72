"""Pallas radix sort vs reference sorts (SURVEY.md §2b #6 oracle tests).

Adversarial cases per SURVEY §5 "sanitizers": duplicate keys everywhere
(stability is observable through the carried values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.sort_ref import radix_sort_ref, sort_pairs
from tpurt.kernels.sort import radix_sort_pallas


def _check(keys_np):
    keys = jnp.asarray(keys_np, jnp.uint32)
    vals = jnp.arange(keys.shape[0], dtype=jnp.int32)
    kp, vp = radix_sort_pallas(keys, vals)
    kr, vr = radix_sort_ref(keys, vals)
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kr))
    # stability: equal keys keep original order -> values must match exactly
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(vr))
    # cross-check against argsort
    np.testing.assert_array_equal(
        np.asarray(kp), np.sort(np.asarray(keys_np).astype(np.uint32))
    )


def test_random_keys():
    rng = np.random.default_rng(0)
    _check(rng.integers(0, 2**32, 5000, dtype=np.uint32))


def test_all_duplicate_keys():
    _check(np.full(4096, 0xDEADBEEF, np.uint32))


def test_few_distinct_adversarial():
    rng = np.random.default_rng(1)
    _check(rng.choice([0, 1, 0xFFFFFFFF, 0x80000000], 3000).astype(np.uint32))


def test_non_block_multiple_sizes():
    rng = np.random.default_rng(2)
    for n in (1, 7, 2047, 2048, 2049, 4097):
        _check(rng.integers(0, 2**32, n, dtype=np.uint32))


def test_sorted_and_reversed():
    _check(np.arange(4096, dtype=np.uint32))
    _check(np.arange(4096, dtype=np.uint32)[::-1].copy())


def test_sort_pairs_pallas_backend_dispatches():
    """The backend='pallas' branch must work (it was a latent ImportError in
    round 1, VERDICT missing #2)."""
    rng = np.random.default_rng(3)
    keys = jnp.asarray(rng.integers(0, 2**32, 1000, dtype=np.uint32))
    vals = jnp.arange(1000, dtype=jnp.int32)
    kp, vp = sort_pairs(keys, vals, backend="pallas")
    kx, vx = sort_pairs(keys, vals, backend="xla")
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kx))
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(vx))
