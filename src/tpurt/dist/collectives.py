"""TPU-native collectives for the fit loop (SURVEY.md §2b #22).

The communication backend is XLA collectives over ICI/DCN — `psum` /
`all_gather` / `ppermute` inside `shard_map` — not a hand-rolled NCCL
analogue (the reference has no comm backend at all, SURVEY.md §0).

The one scheduling-sensitive piece is the gradient all-reduce of the inverse
renderer: BASELINE.json:5 requires the grad all-reduce to *overlap* the
backward traversal.  `chunked_grad` expresses that: the per-device ray batch
is split into C independent sub-batches, each contributing
`psum(grad(chunk))`; because chunk i's psum has no data dependence on chunk
i+1's backward, XLA's async collective scheduler (latency-hiding scheduler on
TPU) can launch the reduction of chunk i while chunk i+1 is still traversing.

Evidence status (round 3, honest): the compiled fit step carries one
all-reduce PER CHUNK interleaved with per-chunk backward computations —
the structural precondition for overlap, pinned by
tests/dist/test_overlap_structure.py against the 8-device HLO.  The async
start/done split itself is a TPU-backend scheduling artifact that cannot
be demonstrated in this environment: the CPU mesh lowers collectives
synchronously and the single real chip has no cross-chip collectives to
schedule (docs/PERF.md round 3).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def psum_tree(tree, axis_name: str):
    """All-reduce every leaf of a pytree over the mesh axis."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), tree)


def pmean_tree(tree, axis_name: str):
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis_name), tree)


def chunked_grad(
    loss_fn: Callable[..., Array],
    params,
    chunk_args,
    n_chunks: int,
    axis_name: str | None = None,
):
    """Overlapped data-parallel gradient: sum_i psum(grad(loss(params, chunk_i))).

    loss_fn(params, *chunk) must return a scalar *sum* (not mean) over the
    chunk so chunking and sharding don't change the total.  chunk_args is a
    tuple of arrays whose leading axis is the per-device batch; it is split
    statically into n_chunks (leading axis must divide evenly — pad first).

    Returns (loss, grads), both already psum'd over `axis_name` when given.
    The Python-level unroll (n_chunks is small and static) is what lets each
    chunk's psum issue as soon as that chunk's backward finishes.
    """
    grad_fn = jax.value_and_grad(loss_fn)

    def split(x):
        return jnp.reshape(x, (n_chunks, x.shape[0] // n_chunks, *x.shape[1:]))

    chunks = jax.tree_util.tree_map(split, chunk_args)

    loss_acc = jnp.float32(0.0)
    grads_acc = None
    for i in range(n_chunks):
        chunk_i = jax.tree_util.tree_map(lambda x: x[i], chunks)
        loss_i, grads_i = grad_fn(params, *chunk_i)
        if axis_name is not None:
            loss_i = jax.lax.psum(loss_i, axis_name)
            grads_i = psum_tree(grads_i, axis_name)
        loss_acc = loss_acc + loss_i
        grads_acc = (
            grads_i
            if grads_acc is None
            else jax.tree_util.tree_map(jnp.add, grads_acc, grads_i)
        )
    return loss_acc, grads_acc


def all_gather_tree(tree, axis_name: str, axis: int = 0, tiled: bool = True):
    """Gather sharded leaves to full arrays on every device."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled), tree
    )


def ppermute_tree(tree, axis_name: str, perm):
    """Rotate a pytree around the mesh ring (building block of dist/ring.py)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, axis_name, perm), tree
    )
