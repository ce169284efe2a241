"""CLI launcher for the TPU-native instant-nsr framework.

Mirrors the reference's launch.py surface (reference launch.py:10-31):

    python launch.py --config configs/nerf-synthetic.yaml --train \
        [--resume ckpt.npz] [--resume_weights_only] [dot.list=overrides]

Differences, driven by the TPU runtime: ``--gpu`` becomes ``--devices``
(a chip count for the data-parallel mesh; default = all visible), precision
is bf16-by-design instead of an AMP flag, and the trainer is the in-repo
step-based loop (instant_nsr_pl_tpu/trainer.py) rather than Lightning.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config yaml")
    parser.add_argument(
        "--devices",
        default=None,
        help="number of devices for the data-parallel mesh (default: all)",
    )
    parser.add_argument(
        "--platform",
        default=None,
        help="pin the JAX platform (e.g. 'cpu'); set via jax.config because "
        "the JAX_PLATFORMS env var can be overridden by site plugins",
    )
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--predict", action="store_true")
    parser.add_argument("--export", action="store_true")
    parser.add_argument("--resume", default=None, help="checkpoint to resume")
    parser.add_argument(
        "--resume_weights_only",
        action="store_true",
        help="load model weights from --resume but start training state fresh",
    )
    parser.add_argument("--exp_dir", default="./exp")
    parser.add_argument("--runs_dir", default="./runs")
    parser.add_argument("--verbose", action="store_true")
    # multi-host launch (reference: torch DDP env-rank discovery,
    # utils/misc.py:42-50). Flags win over NSR_* env vars; on a TPU pod
    # slice none are needed (the runtime self-discovers).
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (multi-host runs)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, extras = parser.parse_known_args()

    if args.platform is not None:
        import jax as _jax_pin

        _jax_pin.config.update("jax_platforms", args.platform)

    from instant_nsr_pl_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    try:  # persistent compile cache (repeat runs skip multi-minute compiles)
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from instant_nsr_pl_tpu.config import load_config
    from instant_nsr_pl_tpu.registry import datasets, systems
    import instant_nsr_pl_tpu.datasets  # noqa: F401
    import instant_nsr_pl_tpu.systems  # noqa: F401
    from instant_nsr_pl_tpu.trainer import Trainer
    from instant_nsr_pl_tpu.utils.callbacks import snapshot_code, snapshot_config

    config = load_config(args.config, cli_args=extras)
    config.setdefault("cmd_args", vars(args))

    name = config.get("name", os.path.splitext(os.path.basename(args.config))[0])
    tag = config.get("tag", "") or ""
    if (
        getattr(args, "resume", None)
        and not getattr(args, "resume_weights_only", False)
        and not config.get("trial_name")
    ):
        # Resuming a run (e.g. a watchdog restart after a tunnel stall):
        # reuse the interrupted trial dir when the checkpoint lives under
        # this exp layout, so checkpoints/renders/logs ACCUMULATE instead
        # of starting over in a fresh trial — this is what lets the test
        # loop skip already-rendered views (trainer.py).
        ckd = os.path.dirname(os.path.abspath(args.resume))
        trial_dir = os.path.dirname(ckd)
        if os.path.basename(ckd) == "ckpt" and os.path.dirname(
            trial_dir
        ) == os.path.abspath(os.path.join(args.exp_dir, name)):
            config["trial_name"] = os.path.basename(trial_dir)
    if not config.get("trial_name"):
        trial = (tag + "@" if tag else "") + datetime.now().strftime(
            "%Y%m%d-%H%M%S"
        )
        config["trial_name"] = trial
    exp_dir = os.path.join(args.exp_dir, name, config["trial_name"])
    runs_dir = os.path.join(args.runs_dir, name, config["trial_name"])
    os.makedirs(exp_dir, exist_ok=True)

    import numpy as np

    seed = int(config.get("seed", 42))
    np.random.seed(seed)

    dm = datasets.make(config.dataset.name, config.dataset)
    system = systems.make(config.system.name, config)

    # data-parallel mesh over the requested chip count (the reference's
    # `--gpu 0,1,...` DDP role). Default: single-device; `--devices all`
    # uses every visible chip.
    import jax

    n_devices = None
    if args.devices is not None:
        n_devices = (
            len(jax.devices()) if args.devices == "all" else int(args.devices)
        )
    elif jax.process_count() > 1:
        n_devices = len(jax.devices())  # multi-host implies the global mesh
    if n_devices is not None and n_devices > 1:
        from instant_nsr_pl_tpu.parallel import make_mesh

        system.configure_parallel(make_mesh(n_devices))

    trainer = Trainer(config, exp_dir, runs_dir=runs_dir)

    if jax.process_index() == 0:
        snapshot_code(os.path.join(exp_dir, "code"))
        snapshot_config(os.path.join(exp_dir, "config"), config, args.config)

    if args.train:
        state = trainer.fit(
            system,
            dm,
            resume=args.resume,
            resume_weights_only=args.resume_weights_only,
        )
        trainer.test(system, dm, state)  # auto-test after fit (launch.py:115)
    elif args.validate:
        state = _restore(system, dm, args, trainer)
        trainer.validate(system, dm, state)
    elif args.test:
        state = _restore(system, dm, args, trainer)
        trainer.test(system, dm, state)
    elif args.predict:
        state = _restore(system, dm, args, trainer)
        trainer.predict(system, dm, state)
    elif args.export:
        state = _restore(system, dm, args, trainer)
        trainer.export(system, state)
    else:
        parser.error("one of --train/--validate/--test/--predict/--export required")


def _restore(system, dm, args, trainer):
    from instant_nsr_pl_tpu.utils.checkpoint import load_checkpoint

    if not args.resume:
        raise SystemExit("--resume <ckpt> is required for this mode")
    dm.setup("fit")
    system.setup_data(dm.train)
    state = system.init_state(seed=int(trainer.config.get("seed", 42)))
    # re-globalize for multi-process meshes (no-op single-process)
    return system._globalize(load_checkpoint(args.resume, state))


if __name__ == "__main__":
    main()
