"""Area-light sampling tests (SURVEY.md §2b #13; VERDICT r1 #10 — the
`emission` field must be a physical light source, not dead weight)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.core.geometry import PointLight, Rays, Triangles
from tpurt.core.scene import Scene
from tpurt.render.pipeline import make_tracer, render_rays
from tpurt.render.shade import sample_emitters


def _floor_and_emitter(le=8.0, size=0.05, h=2.0):
    """A big floor quad at y=0 plus a small emissive triangle at height h."""
    verts = np.array([
        [-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5],          # floor
        [-size, h, -size], [size, h, -size], [0, h, size],       # emitter
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6]], np.int32)
    emission = np.zeros((3, 3), np.float32)
    emission[2] = le
    tris = Triangles.create(verts, faces, albedo=0.7, emission=emission)
    lights = PointLight(
        pos=jnp.zeros((0, 3)), intensity=jnp.zeros((0, 3))
    )
    scene = Scene(
        tris=tris, lights=lights,
        ambient=jnp.zeros(3), background=jnp.zeros(3),
    )
    return scene


def test_sample_emitters_on_surface_and_pdf():
    scene = _floor_and_emitter()
    key = jax.random.PRNGKey(0)
    p, nl, le, pdf, any_e = sample_emitters(key, scene.tris, 256)
    assert bool(any_e)
    # all samples on the (only) emissive triangle's plane y = 2
    np.testing.assert_allclose(np.asarray(p[:, 1]), 2.0, atol=1e-5)
    assert (np.asarray(le) > 0).all()
    # uniform-area pdf = 1/area of the emitter
    v = np.asarray(scene.tris.verts)
    e_area = 0.5 * np.linalg.norm(
        np.cross(v[5] - v[4], v[6] - v[4])
    )
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / e_area, rtol=1e-4)


def test_small_area_light_matches_equivalent_point_light():
    """A tiny emitter sampled by MC must agree with the equivalent point
    light (I = Le * A * cos_l) to a few percent — the radiometric anchor."""
    le, size, h = 8.0, 0.05, 2.0
    scene = _floor_and_emitter(le, size, h)
    v = np.asarray(scene.tris.verts)
    e_area = 0.5 * np.linalg.norm(np.cross(v[5] - v[4], v[6] - v[4]))
    centroid = v[4:7].mean(axis=0)

    # a handful of receiver rays looking straight down at the floor
    xs = np.linspace(-0.5, 0.5, 8, dtype=np.float32)
    o = np.stack([xs, np.full_like(xs, 3.0), np.zeros_like(xs)], -1)
    d = np.tile(np.array([[0, -1.0, 0]], np.float32), (8, 1))
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))

    tracer = make_tracer(scene, "brute")
    img_area = render_rays(
        tracer, rays, light_samples=64, key=jax.random.PRNGKey(1)
    )

    # analytic small-source approximation evaluated at the emitter centroid
    n_e = np.cross(v[5] - v[4], v[6] - v[4])
    n_e = n_e / np.linalg.norm(n_e)
    # receiver hit points are on the floor directly below each origin
    pr = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], -1)
    delta = centroid[None] - pr
    r2 = (delta ** 2).sum(-1)
    wi = delta / np.sqrt(r2)[:, None]
    cos_s = np.maximum((wi * np.array([0, 1.0, 0])).sum(-1), 0.0)
    cos_l = np.abs((wi * n_e).sum(-1))
    expect = 0.7 / np.pi * le * e_area * cos_s * cos_l / r2  # per channel

    got = np.asarray(img_area)[:, 0]
    np.testing.assert_allclose(got, expect, rtol=0.08)


def test_area_light_penumbra_and_grads():
    """An occluder between floor and emitter yields fractional visibility
    somewhere (soft shadow), and the area-light path is differentiable."""
    scene = _floor_and_emitter(le=8.0, size=0.6, h=2.0)
    # occluder quad at y=1 partly covering the emitter
    v = np.asarray(scene.tris.verts)
    occ_v = np.array([[-0.4, 1, -0.4], [0.4, 1, -0.4], [0.4, 1, 0.4],
                      [-0.4, 1, 0.4]], np.float32)
    verts = np.concatenate([v, occ_v])
    faces = np.concatenate([
        np.asarray(scene.tris.faces),
        np.array([[7, 8, 9], [7, 9, 10]], np.int32),
    ])
    emission = np.concatenate([
        np.asarray(scene.tris.emission), np.zeros((2, 3), np.float32)
    ])
    tris = Triangles.create(verts, faces, albedo=0.7, emission=emission)
    scene = scene.replace(tris=tris)

    # Rays start BELOW the occluder (y=0.8) so every primary hit is the floor:
    # umbra around x=0, penumbra for |x| in ~(0.2, 1.4), lit beyond.
    xs = np.linspace(-2.2, 2.2, 45, dtype=np.float32)
    o = np.stack([xs, np.full_like(xs, 0.8), np.zeros_like(xs)], -1)
    d = np.tile(np.array([[0, -1.0, 0]], np.float32), (45, 1))
    rays = Rays(o=jnp.asarray(o), d=jnp.asarray(d))

    tracer = make_tracer(scene, "brute")
    img = np.asarray(render_rays(
        tracer, rays, light_samples=128, key=jax.random.PRNGKey(2)
    ))[:, 0]
    lit, dark = img.max(), img.min()
    assert dark < 0.25 * lit  # umbra exists
    mid = (img > dark + 0.2 * (lit - dark)) & (img < lit - 0.2 * (lit - dark))
    assert mid.any(), "no penumbra: area light not actually soft"

    def loss(verts):
        sc = scene.replace(tris=scene.tris.replace(verts=verts))
        tr = make_tracer(sc, "brute")
        c = render_rays(tr, rays, light_samples=16, key=jax.random.PRNGKey(3))
        return jnp.sum(c)

    g = jax.grad(loss)(scene.tris.verts)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0
