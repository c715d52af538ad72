"""Fast vertex-gather gradients: sorted segment-sum instead of scatter-add.

SURVEY.md §2b #17's goal is fast gradient accumulation at scale.  The soft
differentiable path gathers triangle-corner vertices for every
(ray, layer, occluder) pair and recomputes attributes analytically; the
reverse-mode transpose of a plain ``verts[idx]`` gather is a scatter-add
into the (V, 3) gradient buffer.  Measured on v5e (docs/PERF.md round 3):
that scatter runs at ~93 ns/row (0.13 GB/s — layout/latency-bound; the tiny
trailing dim pads 8x), and round 3's soft backward issued ~140
scatter-equivalents = ~3.4 s of its 3.6 s fwd+bwd.  Pre-sorting the indices
does NOT make the scatter itself faster (measured 29.2 vs 24.4 ms) — the
fix must avoid the scatter primitive entirely.

`gather_verts` is that fix: a custom-VJP gather whose backward is the
segment-sum over sorted (vertex id, contribution) pairs that SURVEY.md
§7 "#17" prescribes, built only from bandwidth-bound primitives:

  1. ``lax.sort_key_val`` of the flat ids with their positions,
  2. one row gather to permute the contributions,
  3. a SEGMENTED associative scan (log N passes) — segment sums never cross
     vertex boundaries, so there is no global-prefix cancellation the way a
     plain cumsum-and-subtract would have in f32,
  4. per-vertex boundary lookup via binary search + gather (no scatter).

The backend is switchable (`set_grad_backend`) so the decision stays a
measurement: 'segsum' (default) vs 'scatter' (the plain transpose).

The reference repo has no backward kernels of any kind to mirror
(SURVEY.md §0); the capability is mandated by BASELINE.json:2,5 (fwd+bwd
rays/s as a first-class metric).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_BACKEND = "segsum"  # 'segsum' | 'scatter'


def set_grad_backend(backend: str) -> None:
    """Select the gather-transpose implementation ('segsum' | 'scatter').

    Module-global because it selects a numerically-equivalent lowering, not
    a model change; tests pin it explicitly where it matters."""
    global _BACKEND
    if backend not in ("segsum", "scatter"):
        raise ValueError(backend)
    _BACKEND = backend


def get_grad_backend() -> str:
    return _BACKEND


def segment_accumulate(idx: Array, cot: Array, num_rows: int) -> Array:
    """Sum contribution rows by id without a multi-column scatter.

    idx: (N,) int32 in [0, num_rows); cot: (N, C) f32.
    Returns (num_rows, C) with out[v] = sum of cot rows where idx == v.

    Every piece was chosen by on-chip measurement at N=786K, V=510K
    (docs/PERF.md round 4):
      - lax.sort_key_val: 4.8 ms;
      - payload row gather: 7.9 ms;
      - MANUAL log-shift segmented scan: 3.2 ms / 2.1 s compile, vs
        lax.associative_scan's 7.5 ms / 103 s compile for the same
        recurrence (tuple-carrier assoc-scan is compile-pathological);
      - per-vertex bounds from bincount+cumsum (~9 ms) instead of
        jnp.searchsorted (70 ms scan-mode / 15.6 ms sort-mode).
    Segment sums never cross vertex boundaries (no global-prefix
    cancellation in f32 the way a plain cumsum-and-subtract would have).
    """
    n = idx.shape[0]
    # ONE multi-operand sort carrying every payload column instead of
    # sort_key_val + a row gather of the payload: XLA row gathers wider
    # than 8 columns hit a ~4x slower lowering (measured round 5: a
    # (2.1M, 9) permute gather costs 49.4 ms vs 12.9 ms at 8 columns,
    # while lax.sort with the 9 columns as payload operands does the whole
    # sort+permute in 13.6 ms).
    c_cols = cot.shape[-1]
    sorted_ops = jax.lax.sort(
        (idx,) + tuple(cot[:, i] for i in range(c_cols)), num_keys=1
    )
    sidx = sorted_ops[0]

    # TWO-LEVEL segmented scan (round 5): the flat log-shift scan paid
    # log2(N) ~ 21 full-array passes; blocking into rows of B pays log2(B)
    # = 8 passes over the data (on well-tiled (N/B, B) per-column arrays)
    # plus a tiny linear-recurrence scan over the N/B block summaries.
    B = 256
    pad = (-n) % B
    sid2 = jnp.pad(sidx, (0, pad), constant_values=num_rows).reshape(-1, B)
    y = [jnp.pad(c, (0, pad)).reshape(-1, B) for c in sorted_ops[1:]]
    nb = sid2.shape[0]
    prev = jnp.pad(sid2, ((0, 0), (1, 0)), constant_values=-1)[:, :B]
    blk = sid2 != prev  # block-local segment starts (row 0 always starts)
    sh = 1
    while sh < B:
        bpad = jnp.pad(blk, ((0, 0), (sh, 0)), constant_values=True)[:, :B]
        y = [
            jnp.where(blk, c, c + jnp.pad(c, ((0, 0), (sh, 0)))[:, :B])
            for c in y
        ]
        blk = blk | bpad
        sh *= 2
    # Block carries: a segment crossing block edges needs the sum of its
    # rows in EARLIER blocks added to its rows here.  carry obeys the
    # linear recurrence carry[b] = g[b] + a[b] * carry[b-1] with
    # a = "previous block is one whole segment that continues into b" and
    # g = "previous block's trailing-piece sum if it continues into b";
    # solved by a log-shift recurrence-composition scan over nb rows.
    head = sid2[:, 0]
    tail_id = sid2[:, -1]
    full = head == tail_id  # sorted => no internal boundary iff all equal
    tid_prev = jnp.pad(tail_id, (1, 0), constant_values=-2)[:nb]
    cont = tid_prev == head
    a = (cont & jnp.pad(full, (1, 0))[:nb]).astype(jnp.float32)
    gs = [
        jnp.where(cont, jnp.pad(c[:, -1], (1, 0))[:nb], 0.0) for c in y
    ]
    aa = a
    sh = 1
    while sh < nb:
        as_ = jnp.pad(aa, (sh, 0))[:nb]
        gs = [c + aa * jnp.pad(c, (sh, 0))[:nb] for c in gs]
        aa = aa * as_
        sh *= 2
    # rows with id == head belong to the block's first piece (sorted =>
    # they are a prefix); only those receive the carry
    first = sid2 == head[:, None]
    y = [c + cc[:, None] * first for c, cc in zip(y, gs)]

    # segment totals live at segment ENDS; end position of vertex v's
    # segment is hi[v]-1 where hi = cumulative id histogram.  Gather the
    # end rows in <=8-column groups (the >8-wide row-gather lowering is
    # ~4x slower — same cliff as the payload permute above).
    counts = jnp.zeros((num_rows,), jnp.int32).at[idx].add(1)
    hi = jnp.cumsum(counts)
    g = jnp.maximum(hi - 1, 0)
    flat = jnp.stack([c.reshape(-1) for c in y], axis=-1)  # (n+pad, C)
    ends = jnp.concatenate(
        [flat[:, i:i + 8][g] for i in range(0, c_cols, 8)], axis=-1
    )
    return jnp.where((counts > 0)[:, None], ends, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_verts(verts: Array, idx: Array, grad_cols: int | None = None) -> Array:
    """``verts[idx]`` with a segment-sum (not scatter) reverse transpose.

    verts: (V, 3) f32; idx: any int shape (invalid ids must be pre-clamped
    to a valid row — their cotangents are zero by masking upstream).
    Returns verts[idx], shape idx.shape + (3,).

    grad_cols: restrict the backward to the first `grad_cols` columns —
    the rest of the gradient is zero-filled WITHOUT being sorted/summed.
    For callers whose trailing columns are gradient-dead by construction
    (the soft path's emission columns: emission never depends on the
    fittable parameters, render/pipeline.tri_table), this trims the
    sorted segment-sum payload.  Correctness-neutral only when the caller
    can prove the dropped columns' gradients are never consumed.
    """
    return verts[idx]


def _gv_fwd(grad_cols, verts, idx):
    return verts[idx], (idx, verts.shape[0])


def _gv_bwd(grad_cols, res, cot):
    idx, v_rows = res
    flat_idx = idx.reshape(-1)
    flat_cot = cot.reshape(-1, cot.shape[-1])
    n_cols = flat_cot.shape[-1]
    if grad_cols is not None and grad_cols < n_cols:
        flat_cot = flat_cot[:, :grad_cols]
    if _BACKEND == "scatter":
        # PER-COLUMN scatters: XLA's multi-column f32 scatter-add runs ~8.5x
        # slower than C independent single-column scatters on v5e (66.8 vs
        # 3 x 7.8 ms at 786K rows — measured, docs/PERF.md round 4)
        cols = [
            jnp.zeros((v_rows,), cot.dtype).at[flat_idx].add(flat_cot[:, c])
            for c in range(flat_cot.shape[-1])
        ]
        grad = jnp.stack(cols, axis=-1)
    else:
        grad = segment_accumulate(flat_idx, flat_cot, v_rows)
    if grad.shape[-1] < n_cols:
        grad = jnp.pad(grad, ((0, 0), (0, n_cols - grad.shape[-1])))
    return grad, None


gather_verts.defvjp(_gv_fwd, _gv_bwd)


def gather_corners(verts: Array, faces: Array, tid: Array):
    """Triangle corners (v0, v1, v2) for (stop-grad) triangle ids.

    ONE fused gather (and therefore ONE sorted segment-sum on the way back)
    for all three corners of every id — the backward cost is one sort of
    3*N rows instead of three independent transposes.  tid: (...,) int32,
    callers clamp invalid ids to 0 and mask the results.
    """
    tid = jax.lax.stop_gradient(tid)
    f = faces[tid]  # (..., 3) int32 — integer gather, no gradient path
    v = gather_verts(verts, f)  # (..., 3 corners, 3)
    return v[..., 0, :], v[..., 1, :], v[..., 2, :]
