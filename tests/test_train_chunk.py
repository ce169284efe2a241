"""Scan-megastep parity: ``train_chunk`` (n steps in one jitted lax.scan
dispatch, systems/base.py make_train_chunk) must reproduce the per-step
``train_step`` loop — same rng threading, same occ-update cadence, same
optimization trajectory. The megastep exists purely to amortize per-call
dispatch overhead over the tunneled TPU runtime (PERF.md).

Bitwise parameter equality is NOT the invariant: the scan body is a
separate XLA compilation from the plain jitted step, and Adam normalizes
gradients, amplifying ulp-level fp differences on rarely-touched hash
table entries to full-lr magnitude within a couple of steps (while the
loss stays equal to ~1e-8). The meaningful invariant is the per-step LOSS
trajectory plus exact step/cadence accounting."""

import jax
import numpy as np

from instant_nsr_pl_tpu.registry import datasets, systems
import instant_nsr_pl_tpu.datasets  # noqa: F401
import instant_nsr_pl_tpu.systems  # noqa: F401

from tests.test_systems import _nerf_config


def _fresh_system():
    cfg = _nerf_config(size=32)
    # exercise both sides of the warmup boundary and a mid-interval start
    cfg.model.grid_warmup_steps = 16
    cfg.model.grid_update_every = 8
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    return system


def test_train_chunk_matches_per_step_loop():
    n_steps = 21  # crosses warmup (16) and is not a multiple of the cadence

    sys_a = _fresh_system()
    state_a = sys_a.init_state(seed=0)
    losses_a = []
    for _ in range(n_steps):
        state_a, metrics_a = sys_a.train_step(state_a)
        losses_a.append(float(metrics_a["train/loss"]))

    sys_b = _fresh_system()
    state_b = sys_b.init_state(seed=0)
    losses_b = []
    # split across two calls so a chunk starts mid grid-update interval;
    # capture per-step losses from the stacked chunk metrics
    orig = sys_b.make_train_chunk

    def capturing_make(k, n_rays=None):
        fn = orig(k, n_rays=n_rays)

        def wrapped(state, data):
            state, stacked = fn(state, data)
            losses_b.extend(np.asarray(stacked["train/loss"]).tolist())
            return state, stacked

        return wrapped

    sys_b.make_train_chunk = capturing_make
    state_b, _ = sys_b.train_chunk(state_b, 5)
    state_b, metrics_b = sys_b.train_chunk(state_b, n_steps - 5)

    assert int(state_a["step"]) == int(state_b["step"]) == n_steps
    assert len(losses_b) == n_steps
    # chunk-boundary structure: 5 | 3 (to cadence) | 8 | 5
    assert set(sys_b._jitted) == (
        {("chunk", sys_b.active_num_rays, k) for k in (5, 3, 8)}
        | {"occ_warmup", "occ"}
    )
    np.testing.assert_allclose(losses_a, losses_b, rtol=2e-2, atol=1e-5)
    # early steps (before Adam's ulp amplification accumulates) match tightly
    np.testing.assert_allclose(losses_a[:3], losses_b[:3], rtol=1e-4)
    assert np.isfinite(float(metrics_b["train/loss"]))
