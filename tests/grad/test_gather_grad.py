"""gather_verts / segment_accumulate: the segment-sum transpose must equal
the scatter transpose bitwise-closely on every id distribution, including
the adversarial all-duplicate case (SURVEY.md §4b 'race detection' analogue
— grad accumulation is the one place contributions collide)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.diff.gather_grad import (
    gather_corners,
    gather_verts,
    segment_accumulate,
    set_grad_backend,
)


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    set_grad_backend("segsum")


@pytest.mark.parametrize(
    "name,make_idx",
    [
        ("uniform", lambda rng, n, v: rng.integers(0, v, n)),
        ("all_dup", lambda rng, n, v: np.full(n, 3)),
        ("two_hot", lambda rng, n, v: rng.choice([0, v - 1], n)),
        ("sorted", lambda rng, n, v: np.sort(rng.integers(0, v, n))),
        ("clustered", lambda rng, n, v: rng.integers(0, 5, n) * (v // 7)),
    ],
)
def test_segment_accumulate_matches_scatter(name, make_idx):
    rng = np.random.default_rng(7)
    n, v = 4096, 257
    idx = jnp.asarray(make_idx(rng, n, v), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ref = jnp.zeros((v, 3), jnp.float32).at[idx].add(cot)
    got = segment_accumulate(idx, cot, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_verts_grad_equals_plain_gather_grad():
    rng = np.random.default_rng(1)
    verts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 100, (64, 5)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(64, 5, 3)), jnp.float32)

    def loss_custom(vv):
        return jnp.sum(w * gather_verts(vv, idx) ** 2)

    def loss_plain(vv):
        return jnp.sum(w * vv[idx] ** 2)

    for backend in ("segsum", "scatter"):
        set_grad_backend(backend)
        g = jax.grad(loss_custom)(verts)
        gp = jax.grad(loss_plain)(verts)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gp),
                                   rtol=1e-5, atol=1e-6, err_msg=backend)


def test_gather_corners_matches_manual():
    rng = np.random.default_rng(2)
    verts = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, 30, (11, 3)), jnp.int32)
    tid = jnp.asarray(rng.integers(0, 11, (17,)), jnp.int32)

    def loss(vv, fn):
        v0, v1, v2 = fn(vv)
        return jnp.sum(v0 * 1.5 + v1 ** 2 - v2 * v0)

    manual = lambda vv: (vv[faces[tid][:, 0]], vv[faces[tid][:, 1]],
                         vv[faces[tid][:, 2]])
    custom = lambda vv: gather_corners(vv, faces, tid)
    np.testing.assert_allclose(loss(verts, custom), loss(verts, manual),
                               rtol=1e-6)
    g = jax.grad(lambda vv: loss(vv, custom))(verts)
    gp = jax.grad(lambda vv: loss(vv, manual))(verts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gp),
                               rtol=1e-5, atol=1e-6)


def test_segment_accumulate_under_jit_and_vmap_shapes():
    """Works inside jit with non-1D cotangent batches (the soft path calls
    it on (R, K, L, 3)-shaped pytrees flattened by gather_verts)."""
    rng = np.random.default_rng(3)
    verts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 50, (8, 4, 3)), jnp.int32)

    @jax.jit
    def g(vv):
        return jax.grad(lambda v: jnp.sum(jnp.sin(gather_verts(v, idx))))(vv)

    gp = jax.grad(lambda v: jnp.sum(jnp.sin(v[idx])))(verts)
    np.testing.assert_allclose(np.asarray(g(verts)), np.asarray(gp),
                               rtol=1e-5, atol=1e-6)
