"""Checkpoint save/resume.

Covers the reference's PL ModelCheckpoint + ``--resume`` /
``--resume_weights_only`` contract (reference launch.py:13-18,72-75,110-114):
a checkpoint carries the FULL train state — params, optimizer state,
occupancy grids, step counter and RNG key — so resumed training is exact.

Format: one ``.npz`` of flattened pytree leaves. Restoring uses the live
state produced by ``system.init_state`` as the structure template, which
sidesteps pytree-registration churn for NamedTuples/optax states and makes
version skew loudly detectable (leaf-count/shape mismatch errors).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path, state):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(path, template_state):
    """Restore a full train state using ``template_state`` for structure."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has "
            f"{len(leaves)} — config/model mismatch?"
        )
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        tmpl_arr = jnp.asarray(tmpl)
        if arr.shape != tmpl_arr.shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != template "
                f"{tmpl_arr.shape}"
            )
        if tmpl_arr.dtype == jax.dtypes.canonicalize_dtype(jnp.uint32) and arr.dtype == np.uint32:
            new_leaves.append(jnp.asarray(arr))
        else:
            new_leaves.append(jnp.asarray(arr, tmpl_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_weights_only(path, template_state):
    """Restore only model params (the ``--resume_weights_only`` path,
    reference launch.py:13-18): optimizer/occupancy/step/rng stay fresh."""
    full = load_checkpoint(path, template_state)
    return {**template_state, "params": full["params"], "occ": full["occ"]}
