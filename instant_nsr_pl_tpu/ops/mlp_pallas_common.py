"""Shared packed-MLP machinery for the fused Pallas kernels.

The fused density kernel (ops/cp_mlp_pallas.py) and the fused radiance
kernel (ops/sh_mlp_pallas.py) both end in the same bf16 ReLU MLP chain
(the reference's FullyFusedMLP role, network_utils.py:180-184). Layer
weights are packed into one (sum d_in, Wmax) matrix so a kernel can slice
static row ranges instead of taking a ragged list of refs; columns beyond
each layer's true d_out are zero, which makes the padded math exact:
padded z columns get only the (zero) bias, and padded cotangent rows are
zeroed before the chain starts.

Kernel-side helpers operate on jnp values + refs from inside a
pallas_call body; host-side helpers build/unpack the packed buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def mlp_wmax(mlp_spec) -> int:
    return max(mlp_spec.n_neurons, mlp_spec.dim_out)


def pack_mlp(mlp_params, wmax, reorder_first_rows=None):
    """Pack layer weights into (sum d_in, Wmax) + biases into (L, Wmax).

    ``reorder_first_rows``: optional index array permuting the FIRST
    layer's input rows (used by callers whose kernel concatenates the
    MLP input in a different order than the composed path)."""
    ws, bs = [], []
    for li, layer in enumerate(mlp_params):
        w, b = layer["w"], layer["b"]
        if li == 0 and reorder_first_rows is not None:
            w = w[reorder_first_rows]
        d_in, d_out = w.shape
        ws.append(jnp.pad(w, ((0, 0), (0, wmax - d_out))))
        bs.append(jnp.pad(b, (0, wmax - d_out))[None, :])
    return (
        jnp.concatenate(ws, axis=0).astype(jnp.bfloat16),
        jnp.concatenate(bs, axis=0).astype(jnp.float32),
    )


def unpack_mlp_grads(dws, dbs, mlp_params, reorder_first_rows=None):
    """Slice the packed gradient buffers back into the layer-list pytree,
    undoing a first-layer row reorder if one was applied at pack time."""
    out = []
    row = 0
    for li, layer in enumerate(mlp_params):
        d_in, d_out = layer["w"].shape
        dw = dws[row : row + d_in, :d_out]
        if li == 0 and reorder_first_rows is not None:
            # the permutation is static (built from numpy at trace time), so
            # invert it host-side: a traced `.at[perm].set(iota)` emits a
            # runtime scatter, and today's TPU compiler merges same-index
            # scatters into a variadic scatter whose emitter CHECK-crashes
            # (scatter_emitter.cc ShouldFuseInputIntoScatter)
            inv = np.argsort(np.asarray(reorder_first_rows))
            dw = dw[inv]
        out.append({"w": dw, "b": dbs[li, :d_out]})
        row += d_in
    return out


def packed_row_count(mlp_spec) -> int:
    dims = [mlp_spec.dim_in] + [mlp_spec.n_neurons] * mlp_spec.n_hidden_layers
    return sum(dims)


def kernel_mlp_fwd(ws_ref, bs_ref, x, n_hidden, h_ref, d_out):
    """Forward chain inside a kernel body: x (d_in, BN) f32 -> (d_out, BN).

    Hidden activations (post-ReLU, bf16) are stored to ``h_ref`` (block
    (n_hidden, W, BN)) for the backward."""
    h = x
    row = 0
    for li in range(n_hidden + 1):
        d_in = h.shape[0]
        w = ws_ref[pl.ds(row, d_in), :]
        row += d_in
        z = jax.lax.dot_general(
            w, h.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        z = z + jnp.transpose(bs_ref[pl.ds(li, 1), :])
        if li < n_hidden:
            h = jnp.maximum(z[: h_ref.shape[1], :], 0.0)
            h_ref[li] = h.astype(jnp.bfloat16)
        else:
            h = z
    return h[:d_out, :]


def kernel_mlp_bwd(ws_ref, h_ref, x0, dout, n_hidden, acc, dws_ref, dbs_ref):
    """Backward chain inside a kernel body.

    Args:
      x0: (d_in0, BN) f32 first-layer input (recomputed/reloaded by caller).
      dout: (D, BN) f32 output cotangent (D <= Wmax).
      acc: the caller's accumulate-into-ref helper acc(ref, val, idx=None).
    Returns: d x0 (d_in0, BN) f32.
    """
    bn = x0.shape[1]
    acts = [x0] + [h_ref[li].astype(jnp.float32) for li in range(n_hidden)]
    rows = [a.shape[0] for a in acts]
    row_of = [0]
    for r in rows:
        row_of.append(row_of[-1] + r)

    wmax = ws_ref.shape[1]
    g = dout
    if g.shape[0] < wmax:
        g = jnp.concatenate(
            [g, jnp.zeros((wmax - g.shape[0], bn), jnp.float32)], axis=0
        )
    for li in range(n_hidden, -1, -1):
        a = acts[li]
        dw = jax.lax.dot_general(
            a.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc(dws_ref, dw, idx=(pl.ds(row_of[li], rows[li]), slice(None)))
        acc(
            dbs_ref,
            jnp.sum(g, axis=1, keepdims=True).T,
            idx=(pl.ds(li, 1), slice(None)),
        )
        w = ws_ref[pl.ds(row_of[li], rows[li]), :]
        g_in = jax.lax.dot_general(
            w, g.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if li > 0:
            g = g_in * (acts[li] > 0.0)
        else:
            return g_in


def make_acc(i):
    """Accumulate-into-ref helper for the revisited-output pattern:
    initialize at grid step 0, add afterwards."""

    def acc(ref, val, idx=None):
        @pl.when(i == 0)
        def _():
            if idx is None:
                ref[...] = val
            else:
                ref[idx] = val

        @pl.when(i > 0)
        def _():
            if idx is None:
                ref[...] = ref[...] + val
            else:
                ref[idx] = ref[idx] + val

    return acc
