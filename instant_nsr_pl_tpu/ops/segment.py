"""Scatter-free dense segment sums (sparse-update accumulation on TPU).

XLA lowers ``zeros(T).at[rows].add(vals)`` to a serial per-update loop on
TPU (~58 ns/update, measured); this module computes the same dense result
with two vectorized sorts (~2 ns/element) — the "two-sort sentinel trick":

1. sort ``(2*row, value)`` updates together with one zero-valued sentinel
   ``(2*r + 1, 0)`` per output row — sentinel r lands immediately AFTER all
   updates for row r (stable sort, odd key);
2. inclusive cumsum of the sorted values — each sentinel now carries the
   prefix total through its row;
3. a second sort by ``(row if sentinel else +inf)`` brings the T sentinel
   cumsums to the front in row order; adjacent differences are the dense
   per-row sums.

Used by the hash-grid (ops/hashgrid.py) and VM (ops/vm.py) fast backward
passes — the tiny-cuda-nn CUDA backward's atomic-scatter role
(/root/reference/models/network_utils.py:90 consumes tcnn encodings whose
table gradients are atomic adds on GPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_dense_sorted(rows, values, num_rows, feature_major=False):
    """Dense ``grad[r] = sum_{m: rows[m]=r} values[m]`` without scatter.

    Args:
      rows: (M,) int32 in [0, num_rows).
      values: (M, C) float32.
      num_rows: static output row count.
      feature_major: return (C, num_rows) instead of (num_rows, C).
    Returns:
      (num_rows, C) float32 — or its transpose when ``feature_major``.
    """
    m, c = values.shape
    key_upd = rows.astype(jnp.int32) * 2
    key_sent = jnp.arange(num_rows, dtype=jnp.int32) * 2 + 1
    keys = jnp.concatenate([key_upd, key_sent])
    vals = jnp.concatenate([values, jnp.zeros((num_rows, c), values.dtype)])
    sorted_all = jax.lax.sort(
        (keys,) + tuple(vals[:, j] for j in range(c)), num_keys=1
    )
    sk = sorted_all[0]
    csums = [jnp.cumsum(v) for v in sorted_all[1:]]
    # second sort: sentinels (odd keys) to the front in row order
    big = jnp.int32(2 * num_rows + 2)
    key2 = jnp.where(sk % 2 == 1, sk // 2, big)
    sorted2 = jax.lax.sort((key2,) + tuple(csums), num_keys=1)
    outs = []
    for g in sorted2[1:]:
        g = g[:num_rows]
        outs.append(jnp.diff(g, prepend=jnp.zeros((1,), g.dtype)))
    return jnp.stack(outs, axis=0 if feature_major else 1)
