"""Unit tests: Möller–Trumbore vs closed-form hits on canned triangles
(SURVEY.md §4b), plus the matmul (MXU) all-pairs formulation vs the scalar one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.intersect import (
    intersect_brute,
    intersect_pairs_mm,
    intersect_tri,
    occluded_brute,
)
from tpurt.core.geometry import Rays, T_MAX, Triangles


def unit_tri():
    # Triangle in z=0 plane: (0,0,0), (1,0,0), (0,1,0)
    return (
        jnp.array([0.0, 0.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0]),
    )


def test_direct_hit():
    v0, v1, v2 = unit_tri()
    o = jnp.array([0.25, 0.25, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, u, v, hit = intersect_tri(o, d, v0, v1, v2)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(u), 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(v), 0.25, rtol=1e-5)


def test_miss_outside_barycentric():
    v0, v1, v2 = unit_tri()
    o = jnp.array([0.9, 0.9, 1.0])  # u+v > 1
    d = jnp.array([0.0, 0.0, -1.0])
    t, _, _, hit = intersect_tri(o, d, v0, v1, v2)
    assert not bool(hit)
    assert float(t) == float(np.float32(T_MAX))


def test_behind_origin_misses():
    v0, v1, v2 = unit_tri()
    o = jnp.array([0.25, 0.25, -1.0])
    d = jnp.array([0.0, 0.0, -1.0])  # triangle is behind
    _, _, _, hit = intersect_tri(o, d, v0, v1, v2)
    assert not bool(hit)


def test_parallel_ray_misses():
    v0, v1, v2 = unit_tri()
    o = jnp.array([0.25, 0.25, 1.0])
    d = jnp.array([1.0, 0.0, 0.0])  # parallel to plane
    _, _, _, hit = intersect_tri(o, d, v0, v1, v2)
    assert not bool(hit)


def test_oblique_hit_t_scaling():
    # Unnormalized direction: t is in units of |d|.
    v0, v1, v2 = unit_tri()
    o = jnp.array([0.2, 0.3, 2.0])
    d = jnp.array([0.0, 0.0, -2.0])
    t, u, v, hit = intersect_tri(o, d, v0, v1, v2)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)


def test_brute_closest_of_two():
    tris = Triangles.create(
        verts=[
            [0, 0, 0], [1, 0, 0], [0, 1, 0],   # z=0
            [0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5],  # z=0.5 (closer)
        ],
        faces=[[0, 1, 2], [3, 4, 5]],
    )
    rays = Rays(
        o=jnp.array([[0.2, 0.2, 2.0]]), d=jnp.array([[0.0, 0.0, -1.0]])
    )
    hit = intersect_brute(rays, tris)
    assert int(hit.tri[0]) == 1
    np.testing.assert_allclose(float(hit.t[0]), 1.5, rtol=1e-6)


def test_brute_miss_returns_sentinel():
    tris = Triangles.create(
        verts=[[0, 0, 0], [1, 0, 0], [0, 1, 0]], faces=[[0, 1, 2]]
    )
    rays = Rays(o=jnp.array([[5.0, 5.0, 1.0]]), d=jnp.array([[0.0, 0.0, -1.0]]))
    hit = intersect_brute(rays, tris)
    assert int(hit.tri[0]) == -1
    assert not bool(hit.valid[0])


def test_occlusion_respects_t_max():
    tris = Triangles.create(
        verts=[[0, 0, 0], [1, 0, 0], [0, 1, 0]], faces=[[0, 1, 2]]
    )
    rays = Rays(o=jnp.array([[0.2, 0.2, 2.0]]), d=jnp.array([[0.0, 0.0, -1.0]]))
    assert bool(occluded_brute(rays, tris)[0])
    # Occluder at t=2 is beyond t_max=1 -> unoccluded
    assert not bool(occluded_brute(rays, tris, t_max=1.0)[0])


def test_mm_formulation_matches_scalar():
    key = jax.random.PRNGKey(0)
    kv, ko, kd = jax.random.split(key, 3)
    V = jax.random.normal(kv, (64, 3, 3)) * 2.0
    o = jax.random.normal(ko, (128, 3)) * 3.0
    d = jax.random.normal(kd, (128, 3))
    v0, v1, v2 = V[:, 0], V[:, 1], V[:, 2]
    t_mm, u_mm, v_mm, hit_mm = intersect_pairs_mm(o, d, v0, v1, v2)
    t_s, u_s, v_s, hit_s = intersect_tri(
        o[:, None], d[:, None], v0[None], v1[None], v2[None]
    )
    hits = np.asarray(hit_s)
    assert hits.sum() > 50  # sanity: a decent number of pairs hit
    # Near-threshold pairs may flip; require overwhelming agreement.
    agree = np.mean(np.asarray(hit_mm) == hits)
    assert agree > 0.999
    both = np.asarray(hit_mm & hit_s)
    np.testing.assert_allclose(
        np.asarray(t_mm)[both], np.asarray(t_s)[both], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(u_mm)[both], np.asarray(u_s)[both], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_mm)[both], np.asarray(v_s)[both], rtol=2e-3, atol=2e-3
    )


def test_intersect_is_differentiable():
    v0, v1, v2 = unit_tri()

    def t_of_verts(dz):
        t, _, _, _ = intersect_tri(
            jnp.array([0.25, 0.25, 1.0]),
            jnp.array([0.0, 0.0, -1.0]),
            v0 + jnp.array([0.0, 0.0, dz]),
            v1 + jnp.array([0.0, 0.0, dz]),
            v2 + jnp.array([0.0, 0.0, dz]),
        )
        return t

    g = jax.grad(t_of_verts)(0.0)
    # Moving the triangle up by dz decreases t by dz.
    np.testing.assert_allclose(float(g), -1.0, rtol=1e-5)
