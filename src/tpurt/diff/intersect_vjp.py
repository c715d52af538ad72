"""Analytic custom VJP for Möller–Trumbore intersection (SURVEY.md §2b #15).

`intersect_tuv` computes the smooth (t, u, v) of accel/intersect.intersect_tri
with a hand-derived backward pass instead of autodiff: the VJP recomputes the
tiny forward intermediates (edge vectors, pvec/qvec, det) from the five saved
primal inputs, so nothing besides the inputs is kept live across the forward
pass — the memory shape a fused backward-traversal kernel needs (#17), and
the documented closed form for ∂(t,u,v)/∂(o, d, v0, v1, v2).

Derivation (all per-component, broadcastable):
    e1 = v1 - v0, e2 = v2 - v0, p = d x e2, det = e1.p,
    inv = det / (det^2 + eps)                (smooth pseudo-inverse)
    tv = o - v0, q = tv x e1,
    u = (tv.p) inv, v = (d.q) inv, t = (e2.q) inv.
Adjoint rules used: for c = a x b: a_bar += b x c_bar, b_bar += c_bar x a;
for s = a.b: a_bar += s_bar b; d(inv)/d(det) = (eps - det^2)/(det^2+eps)^2.

tests/grad/test_intersect_vjp.py checks it against jax.grad of the direct
formula (autodiff oracle) and against finite differences.
No reference implementation exists (SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.accel.intersect import DET_EPS
from tpurt.core.math import cross, dot

Array = jax.Array


def _tuv(o, d, v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    p = cross(d, e2)
    det = dot(e1, p)
    inv = det / (det * det + DET_EPS)
    tv = o - v0
    q = cross(tv, e1)
    u = dot(tv, p) * inv
    v = dot(d, q) * inv
    t = dot(e2, q) * inv
    return t, u, v


@jax.custom_vjp
def intersect_tuv(o: Array, d: Array, v0: Array, v1: Array, v2: Array):
    """Smooth Möller–Trumbore (t, u, v) for broadcast-compatible (..., 3)
    inputs. Same formulas (and therefore same values) as
    accel/intersect.intersect_tri; hit masking is the caller's concern."""
    return _tuv(o, d, v0, v1, v2)


def _fwd(o, d, v0, v1, v2):
    return _tuv(o, d, v0, v1, v2), (o, d, v0, v1, v2)


def _bwd(res, cot):
    o, d, v0, v1, v2 = res
    t_bar, u_bar, v_bar = cot

    # Recompute forward intermediates (cheaper than saving them).
    e1 = v1 - v0
    e2 = v2 - v0
    p = cross(d, e2)
    det = dot(e1, p)
    denom = det * det + DET_EPS
    inv = det / denom
    tv = o - v0
    q = cross(tv, e1)
    A = dot(tv, p)  # u = A inv
    B = dot(d, q)  # v = B inv
    C = dot(e2, q)  # t = C inv

    inv_bar = A * u_bar + B * v_bar + C * t_bar
    det_bar = inv_bar * (DET_EPS - det * det) / (denom * denom)
    A_bar = u_bar * inv
    B_bar = v_bar * inv
    C_bar = t_bar * inv

    def bc(s, vec):  # scalar (...,) times vector (..., 3)
        return s[..., None] * vec

    p_bar = bc(A_bar, tv) + bc(det_bar, e1)
    q_bar = bc(B_bar, d) + bc(C_bar, e2)
    tv_bar = bc(A_bar, p)
    d_bar = bc(B_bar, q)
    e1_bar = bc(det_bar, p)
    e2_bar = bc(C_bar, q)  # direct dt/de2 term: t = dot(e2, q) * inv

    # q = tv x e1
    tv_bar = tv_bar + cross(e1, q_bar)
    e1_bar = e1_bar + cross(q_bar, tv)
    # p = d x e2
    d_bar = d_bar + cross(e2, p_bar)
    e2_bar = e2_bar + cross(p_bar, d)

    o_bar = tv_bar
    v0_bar = -tv_bar - e1_bar - e2_bar
    v1_bar = e1_bar
    v2_bar = e2_bar

    # Reduce broadcasted batch dims back to each primal's shape.
    def unbroadcast(g, x):
        extra = g.ndim - x.ndim
        if extra > 0:
            g = jnp.sum(g, axis=tuple(range(extra)))
        axes = tuple(i for i in range(x.ndim) if x.shape[i] == 1 and g.shape[i] != 1)
        if axes:
            g = jnp.sum(g, axis=axes, keepdims=True)
        return g

    return (
        unbroadcast(o_bar, o),
        unbroadcast(d_bar, d),
        unbroadcast(v0_bar, v0),
        unbroadcast(v1_bar, v1),
        unbroadcast(v2_bar, v2),
    )


intersect_tuv.defvjp(_fwd, _bwd)
