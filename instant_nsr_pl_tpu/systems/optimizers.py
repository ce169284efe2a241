"""Optimizer + LR-scheduler factory on optax.

Replaces the reference's ``parse_optimizer`` / ``parse_scheduler`` /
``get_scheduler`` machinery (reference: systems/utils.py:12-346) — the torch
scheduler zoo (MultiStepLR / ExponentialLR / LinearLR / ConstantLR /
SequentialLR / ChainedScheduler, ``interval: step``) becomes compositional
optax *factor schedules* (multiplicative factors of the base lr), and the
per-submodule param groups (``optimizer.params.geometry.lr`` etc., reference
systems/utils.py:314-325) become an ``optax.multi_transform`` partitioned by
the top-level key of the parameter pytree.

Everything is a pure function of the step, so schedules live inside the
jitted train step with zero host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# factor schedules: step -> multiplicative lr factor
# ---------------------------------------------------------------------------


def _constant_factor(cfg):
    factor = float(cfg.get("factor", 1.0 / 3.0))
    total = int(cfg.get("total_iters", 5))

    def sched(step):
        return jnp.where(step < total, factor, 1.0)

    return sched


def _linear_factor(cfg):
    start = float(cfg.get("start_factor", 1.0 / 3.0))
    end = float(cfg.get("end_factor", 1.0))
    total = int(cfg.get("total_iters", 5))

    def sched(step):
        t = jnp.clip(step / max(total, 1), 0.0, 1.0)
        return start + (end - start) * t

    return sched


def _exponential_factor(cfg):
    gamma = float(cfg["gamma"])

    def sched(step):
        return jnp.power(gamma, step)

    return sched


def _multistep_factor(cfg):
    milestones = tuple(int(m) for m in cfg["milestones"])
    gamma = float(cfg.get("gamma", 0.1))

    def sched(step):
        n = jnp.zeros((), jnp.float32)
        for m in milestones:
            n = n + (step >= m)
        return jnp.power(gamma, n)

    return sched


def _step_factor(cfg):
    step_size = int(cfg["step_size"])
    gamma = float(cfg.get("gamma", 0.1))

    def sched(step):
        return jnp.power(gamma, jnp.floor(step / step_size))

    return sched


def _cosine_factor(cfg):
    t_max = int(cfg["T_max"])
    eta_min = float(cfg.get("eta_min", 0.0))

    def sched(step):
        t = jnp.clip(step / max(t_max, 1), 0.0, 1.0)
        # factor interpolates 1 -> eta_min_factor; eta_min here is treated as
        # a factor relative to base lr (torch uses absolute; configs pass 0)
        return eta_min + (1.0 - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return sched


def _sequential_factor(cfg):
    """torch SequentialLR: switch schedulers at milestones, each scheduler
    sees a step counter restarted at its activation (systems/utils.py docs)."""
    children = [make_factor_schedule(c) for c in cfg["schedulers"]]
    milestones = [int(m) for m in cfg["milestones"]]
    assert len(milestones) == len(children) - 1

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        bounds = [0] + milestones
        out = children[0](step)
        for i in range(1, len(children)):
            local = step - bounds[i]
            out = jnp.where(step >= bounds[i], children[i](local), out)
        return out

    return sched


def _chained_factor(cfg):
    """torch ChainedScheduler: all children step every step; factors multiply."""
    children = [make_factor_schedule(c) for c in cfg["schedulers"]]

    def sched(step):
        out = jnp.ones((), jnp.float32)
        for c in children:
            out = out * c(step)
        return out

    return sched


_FACTORY = {
    "ConstantLR": _constant_factor,
    "LinearLR": _linear_factor,
    "ExponentialLR": _exponential_factor,
    "MultiStepLR": _multistep_factor,
    "StepLR": _step_factor,
    "CosineAnnealingLR": _cosine_factor,
    "SequentialLR": _sequential_factor,
    "ChainedScheduler": _chained_factor,
}


def make_factor_schedule(cfg, epoch_steps=None):
    """Scheduler config -> fn(step) -> multiplicative factor.

    Accepts the reference's scheduler config shape: ``{name, interval,
    args: {...}, [schedulers], [milestones]}`` (reference systems/utils.py:
    328-346). ``interval: epoch`` (torch semantics: the scheduler steps once
    per epoch, so its counter is the epoch number) is translated to the
    step-based loop by evaluating the schedule on ``floor(step/epoch_steps)``
    where one nominal epoch = one pass over the train split's images.
    """
    if cfg is None:
        return lambda step: jnp.ones((), jnp.float32)
    name = cfg["name"]
    if name not in _FACTORY:
        raise ValueError(f"Unknown scheduler '{name}'. Known: {sorted(_FACTORY)}")
    interval = cfg.get("interval", "step")
    if interval not in ("step", "epoch"):
        raise ValueError(f"scheduler interval must be step|epoch, got {interval}")
    args = dict(cfg.get("args", {}).items()) if "args" in cfg else {}
    # Sequential/Chained carry children at the top level; children inherit
    # the parent's interval translation (torch steps the whole composite at
    # the parent's cadence), so they are built with interval: step here
    if "schedulers" in cfg:
        args["schedulers"] = [
            dict(c, interval="step") if hasattr(c, "keys") else c
            for c in cfg["schedulers"]
        ]
    if "milestones" in cfg and "milestones" not in args:
        args["milestones"] = list(cfg["milestones"])
    sched = _FACTORY[name](args)
    if interval == "epoch":
        if not epoch_steps:
            raise ValueError(
                "scheduler interval: epoch needs a dataset length to "
                "translate epochs->steps (build the system with setup_data "
                "before init_state)"
            )
        base = sched
        sched = lambda step: base(jnp.floor(step / epoch_steps))  # noqa: E731
    return sched


# ---------------------------------------------------------------------------
# optimizer factory
# ---------------------------------------------------------------------------


def _base_optimizer(name, lr_schedule, args):
    betas = args.get("betas", (0.9, 0.999))
    b1, b2 = float(betas[0]), float(betas[1])
    eps = float(args.get("eps", 1e-8))
    if name in ("Adam", "FusedAdam"):
        return optax.adam(lr_schedule, b1=b1, b2=b2, eps=eps)
    if name == "AdamW":
        # torch AdamW default weight_decay=0.01 (the reference relies on it)
        wd = float(args.get("weight_decay", 0.01))
        return optax.adamw(lr_schedule, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    if name == "SGD":
        return optax.sgd(lr_schedule, momentum=float(args.get("momentum", 0.0)))
    raise ValueError(f"Unknown optimizer '{name}'")


def make_optimizer(optimizer_cfg, scheduler_cfg, params_example, epoch_steps=None):
    """Build the optax GradientTransformation for a config.

    Mirrors ``parse_optimizer`` + ``parse_scheduler`` (reference
    systems/utils.py:311-346): ``optimizer.args`` are the base
    hyperparameters; ``optimizer.params.<group>`` overrides per top-level
    param-pytree key (e.g. geometry / texture / variance); the scheduler
    applies its multiplicative factor to every group's base lr.

    Returns (tx, lr_fn) where lr_fn(step) -> base-group lr (for logging).
    """
    name = optimizer_cfg["name"]
    args = dict(optimizer_cfg.get("args", {}).items())
    base_lr = float(args.get("lr", 1e-3))
    factor = make_factor_schedule(scheduler_cfg, epoch_steps=epoch_steps)

    group_cfg = optimizer_cfg.get("params", None)
    top_keys = sorted(params_example.keys())

    def lr_for(group):
        if group_cfg is not None and group in group_cfg:
            return float(group_cfg[group].get("lr", base_lr))
        return base_lr

    transforms = {}
    for k in top_keys:
        glr = lr_for(k)
        sched = (lambda g: (lambda step: g * factor(step)))(glr)
        transforms[k] = _base_optimizer(name, sched, args)

    def label_fn(params):
        return {k: jax.tree_util.tree_map(lambda _: k, v) for k, v in params.items()}

    tx = optax.multi_transform(transforms, label_fn)
    lr_fn = lambda step: base_lr * factor(step)  # noqa: E731
    return tx, lr_fn
