"""Finite-difference gradient checking harness (SURVEY.md §2b #18).

The acceptance gate from BASELINE.json:2 — pixel and vertex gradients of the
(soft) renderer must be `allclose` to central finite differences.  Works on
arbitrary pytrees of float parameters; probes either every coordinate (small
params) or a random subset of coordinates (large params) to keep cost bounded.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def fd_grad_at(
    f: Callable[[Any], Array],
    params: Any,
    leaf_path: int,
    flat_index: int,
    eps: float,
) -> float:
    """Central finite difference of scalar f w.r.t. one coordinate."""
    leaves, treedef = jax.tree_util.tree_flatten(params)

    def bump(sign):
        new = [x for x in leaves]
        flat = np.asarray(new[leaf_path]).copy().reshape(-1)
        flat[flat_index] += sign * eps
        new[leaf_path] = jnp.asarray(flat.reshape(new[leaf_path].shape))
        return jax.tree_util.tree_unflatten(treedef, new)

    fp = float(f(bump(+1.0)))
    fm = float(f(bump(-1.0)))
    return (fp - fm) / (2.0 * eps)


def fd_grad_at_richardson(
    f: Callable[[Any], Array],
    params: Any,
    leaf_path: int,
    flat_index: int,
    eps: float,
) -> float:
    """Richardson-extrapolated central difference: cancels the O(eps^2) term.

    (4*D(eps/2) - D(eps)) / 3 — needed because the soft renderer's silhouette
    and shadow-terminator features have curvature at the 1/sharpness scale.
    """
    d1 = fd_grad_at(f, params, leaf_path, flat_index, eps)
    d2 = fd_grad_at(f, params, leaf_path, flat_index, eps * 0.5)
    return (4.0 * d2 - d1) / 3.0


def check_grads_fd(
    f: Callable[[Any], Array],
    params: Any,
    *,
    eps: float = 2e-3,
    rtol: float = 5e-2,
    atol: float = 1e-3,
    max_probes_per_leaf: int = 32,
    seed: int = 0,
    verbose: bool = False,
    richardson: bool = True,
) -> dict:
    """Compare jax.grad(f) against central finite differences.

    Returns a report dict {ok, max_abs_err, max_rel_err, n_probes, failures}.
    Raises AssertionError when any probed coordinate disagrees beyond
    (atol + rtol * max(|fd|, |ad|)).
    """
    f_jit = jax.jit(f)
    grad = jax.jit(jax.grad(f))(params)
    g_leaves = jax.tree_util.tree_leaves(grad)
    p_leaves = jax.tree_util.tree_leaves(params)
    rng = np.random.default_rng(seed)
    failures = []
    max_abs = 0.0
    max_rel = 0.0
    n = 0
    for li, (p, g) in enumerate(zip(p_leaves, g_leaves)):
        size = int(np.prod(p.shape)) if p.shape else 1
        if size <= max_probes_per_leaf:
            idxs = np.arange(size)
        else:
            idxs = rng.choice(size, size=max_probes_per_leaf, replace=False)
        g_flat = np.asarray(g).reshape(-1)
        fd_fn = fd_grad_at_richardson if richardson else fd_grad_at
        for fi in idxs:
            fd = fd_fn(f_jit, params, li, int(fi), eps)
            ad = float(g_flat[fi])
            err = abs(fd - ad)
            scale = max(abs(fd), abs(ad))
            if err > atol + rtol * scale:
                # Soft-silhouette features have curvature at the 1/sharpness
                # scale; refine eps before declaring a mismatch. A genuine
                # gradient bug shows a constant FD-AD offset as eps -> 0.
                for refined_eps in (eps * 0.5, eps * 0.25):
                    fd = fd_fn(f_jit, params, li, int(fi), refined_eps)
                    err = abs(fd - ad)
                    scale = max(abs(fd), abs(ad))
                    if err <= atol + rtol * scale:
                        break
            max_abs = max(max_abs, err)
            if scale > atol:
                max_rel = max(max_rel, err / scale)
            n += 1
            if err > atol + rtol * scale:
                failures.append((li, int(fi), fd, ad, err))
            if verbose:
                print(f"leaf {li} idx {fi}: fd={fd:+.6f} ad={ad:+.6f} err={err:.2e}")
    report = {
        "ok": not failures,
        "max_abs_err": max_abs,
        "max_rel_err": max_rel,
        "n_probes": n,
        "failures": failures,
    }
    if failures:
        lines = "\n".join(
            f"  leaf {li} flat[{fi}]: fd={fd:+.6f} ad={ad:+.6f} |err|={err:.3e}"
            for li, fi, fd, ad, err in failures[:16]
        )
        raise AssertionError(
            f"gradient mismatch on {len(failures)}/{n} probes "
            f"(eps={eps}, rtol={rtol}, atol={atol}):\n{lines}"
        )
    return report
