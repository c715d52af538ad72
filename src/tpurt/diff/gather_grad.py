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
    sidx, order = jax.lax.sort_key_val(idx, jnp.arange(n, dtype=jnp.int32))
    scot = cot[order]
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sidx[1:] != sidx[:-1]]
    )
    # log-shift segmented inclusive scan: y[i] accumulates its whole segment
    # prefix; `blk` marks "a segment boundary lies within the last sh rows"
    y = scot
    blk = seg_start
    sh = 1
    while sh < n:
        ypad = jnp.pad(y, ((sh, 0), (0, 0)))[:n]
        bpad = jnp.pad(blk, (sh, 0), constant_values=True)[:n]
        y = jnp.where(blk[:, None], y, y + ypad)
        blk = blk | bpad
        sh *= 2
    # segment totals live at segment ENDS; end position of vertex v's
    # segment is hi[v]-1 where hi = cumulative id histogram
    counts = jnp.zeros((num_rows,), jnp.int32).at[idx].add(1)
    hi = jnp.cumsum(counts)
    return jnp.where((counts > 0)[:, None], y[jnp.maximum(hi - 1, 0)], 0.0)


@jax.custom_vjp
def gather_verts(verts: Array, idx: Array) -> Array:
    """``verts[idx]`` with a segment-sum (not scatter) reverse transpose.

    verts: (V, 3) f32; idx: any int shape (invalid ids must be pre-clamped
    to a valid row — their cotangents are zero by masking upstream).
    Returns verts[idx], shape idx.shape + (3,).
    """
    return verts[idx]


def _gv_fwd(verts, idx):
    return verts[idx], (idx, verts.shape[0])


def _gv_bwd(res, cot):
    idx, v_rows = res
    flat_idx = idx.reshape(-1)
    flat_cot = cot.reshape(-1, cot.shape[-1])
    if _BACKEND == "scatter":
        # PER-COLUMN scatters: XLA's multi-column f32 scatter-add runs ~8.5x
        # slower than C independent single-column scatters on v5e (66.8 vs
        # 3 x 7.8 ms at 786K rows — measured, docs/PERF.md round 4)
        cols = [
            jnp.zeros((v_rows,), cot.dtype).at[flat_idx].add(flat_cot[:, c])
            for c in range(cot.shape[-1])
        ]
        grad = jnp.stack(cols, axis=-1)
    else:
        grad = segment_accumulate(flat_idx, flat_cot, v_rows)
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
