"""Gradient tests for the analytic Möller–Trumbore VJP (diff/intersect_vjp.py).

Checks the custom backward against (a) jax.grad of the identical direct
formula (autodiff oracle) and (b) central finite differences, including
broadcasted batch shapes that exercise unbroadcast() in the backward pass.
This is the test promised by the intersect_vjp docstring (ADVICE r1 #2); the
e2_bar dt/de2 term bug (ADVICE r1 #1) fails it by ~100% relative error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.diff.intersect_vjp import _tuv, intersect_tuv


def _random_inputs(key, batch=()):
    ks = jax.random.split(key, 5)
    o = jax.random.normal(ks[0], (*batch, 3)) * 0.3 + jnp.array([0.0, 0.0, -2.0])
    d = jax.random.normal(ks[1], (*batch, 3)) * 0.2 + jnp.array([0.0, 0.0, 1.0])
    v0 = jax.random.normal(ks[2], (*batch, 3)) * 0.5
    v1 = v0 + jax.random.normal(ks[3], (*batch, 3)) * 0.5 + jnp.array([1.0, 0, 0])
    v2 = v0 + jax.random.normal(ks[4], (*batch, 3)) * 0.5 + jnp.array([0, 1.0, 0])
    return o, d, v0, v1, v2


def _scalar_loss(fn, w):
    def loss(args):
        t, u, v = fn(*args)
        return jnp.sum(w[0] * t + w[1] * u + w[2] * v)

    return loss


@pytest.mark.parametrize("batch", [(), (7,), (3, 5)])
def test_vjp_matches_autodiff_oracle(batch):
    key = jax.random.PRNGKey(0)
    args = _random_inputs(key, batch)
    w = (1.3, -0.7, 0.4)
    g_custom = jax.grad(_scalar_loss(intersect_tuv, w))(args)
    g_oracle = jax.grad(_scalar_loss(_tuv, w))(args)
    for gc, go, name in zip(g_custom, g_oracle, "o d v0 v1 v2".split()):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(go), rtol=2e-5, atol=2e-6,
            err_msg=f"cotangent mismatch for {name}",
        )


def test_vjp_broadcasted_batch_dims():
    """Rays batched (R, 3) against a single shared triangle (3,): the vertex
    cotangents must reduce over the broadcast ray axis (unbroadcast path)."""
    key = jax.random.PRNGKey(1)
    o, d, _, _, _ = _random_inputs(key, (16,))
    _, _, v0, v1, v2 = _random_inputs(jax.random.PRNGKey(2))
    args = (o, d, v0, v1, v2)
    w = (0.9, 0.2, -1.1)
    g_custom = jax.grad(_scalar_loss(intersect_tuv, w))(args)
    g_oracle = jax.grad(_scalar_loss(_tuv, w))(args)
    for gc, go, a in zip(g_custom, g_oracle, args):
        assert gc.shape == a.shape
        np.testing.assert_allclose(np.asarray(gc), np.asarray(go), rtol=2e-5,
                                   atol=2e-6)


def test_vjp_matches_finite_differences():
    key = jax.random.PRNGKey(3)
    args = _random_inputs(key)
    w = (1.0, 1.0, 1.0)
    loss = _scalar_loss(intersect_tuv, w)
    g = jax.grad(loss)(args)
    eps = 1e-3
    for leaf in range(5):
        for idx in range(3):
            def f_scalar(x):
                a = list(args)
                a[leaf] = a[leaf].at[idx].add(x)
                return loss(tuple(a))

            fd = (f_scalar(eps) - f_scalar(-eps)) / (2 * eps)
            ad = float(np.asarray(g[leaf])[idx])
            assert abs(fd - ad) <= 1e-2 * max(1.0, abs(fd)), (leaf, idx, fd, ad)
