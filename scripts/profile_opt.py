"""Additive decomposition of the train step: loss fwd, fwd+bwd, +optimizer,
+extra, full jitted step — to localize non-compute cost (padding, copies).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(f, *args, n=6):
    r = f(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    from bench import build_system

    system = build_system()
    state = system.init_state(seed=0)
    for _ in range(40):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])

    data = system.data
    n_rays = system.active_num_rays
    print("active rays", n_rays, flush=True)

    def sample_batch(state):
        rng, k_sample, k_bg, k_fwd = jax.random.split(state["rng"], 4)
        rays_o, rays_d, rgb, fg_mask = system._sample_rays(
            data, k_sample, n=n_rays
        )
        bg = system._background_color(k_bg, n_rays, train=True)
        return {
            "rays_o": rays_o, "rays_d": rays_d, "rgb": rgb,
            "fg_mask": fg_mask, "background_color": bg,
        }, k_fwd

    @jax.jit
    def f_fwd(state):
        batch, k_fwd = sample_batch(state)
        loss, metrics = system.loss_fn(
            state["params"], state["occ"], batch, k_fwd, state["step"],
            n_rays=n_rays, extra=state.get("extra"),
        )
        return loss

    print(f"loss fwd only:        {timeit(f_fwd, state)*1e3:9.2f} ms", flush=True)

    @jax.jit
    def f_vag(state):
        batch, k_fwd = sample_batch(state)

        def loss_of(p):
            return system.loss_fn(
                p, state["occ"], batch, k_fwd, state["step"],
                n_rays=n_rays, extra=state.get("extra"),
            )

        (loss, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"]
        )
        return loss, grads

    print(f"loss fwd+bwd:         {timeit(f_vag, state)*1e3:9.2f} ms", flush=True)

    @jax.jit
    def f_opt(state):
        batch, k_fwd = sample_batch(state)

        def loss_of(p):
            return system.loss_fn(
                p, state["occ"], batch, k_fwd, state["step"],
                n_rays=n_rays, extra=state.get("extra"),
            )

        (loss, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"]
        )
        updates, opt_state = system.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return loss, params, opt_state

    print(f"fwd+bwd+optimizer:    {timeit(f_opt, state)*1e3:9.2f} ms", flush=True)

    @jax.jit
    def f_opt_extra(state):
        loss, params, opt_state = f_opt(state)
        extra = state.get("extra", {})
        if hasattr(system.model, "update_extra_state"):
            extra = system.model.update_extra_state(params, extra, state["step"])
        return loss, params, opt_state, extra

    print(f"+extra state:         {timeit(f_opt_extra, state)*1e3:9.2f} ms", flush=True)

    step_fn = system.make_train_step(n_rays=n_rays)  # no donation reuse here

    def run_step(state):
        s2, m = step_fn(state, data)
        return m["train/loss"]

    # time WITHOUT donation interplay: reuse same input state each call
    state_nd = jax.tree.map(jnp.array, state)
    t = timeit(lambda: run_step(jax.tree.map(jnp.array, state_nd)))
    print(f"jitted step (fresh state each call): {t*1e3:9.2f} ms", flush=True)

    # the real loop: donated chained state
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])
    print(f"train_step loop avg:  {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
