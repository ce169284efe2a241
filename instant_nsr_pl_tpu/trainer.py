"""Training orchestration: the PyTorch-Lightning ``Trainer`` role.

Owns what the reference delegates to Lightning (launch.py:100-121): the
step-based fit loop with periodic validation, checkpointing and logging;
validate/test/predict entries; end-of-fit test; mesh export. All compute
happens in the system's jitted functions — this loop only schedules them.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.utils import savers
from instant_nsr_pl_tpu.utils.checkpoint import (
    load_checkpoint,
    load_weights_only,
    save_checkpoint,
)
from instant_nsr_pl_tpu.utils.loggers import ConsoleLogger, CSVLogger, TensorBoardLogger


def data_arrays(dataset):
    """Device-array dict for a dataset split (the eval-side counterpart of
    ``BaseSystem.setup_data``); honors ``load_data_on_gpu: false`` via uint8
    residency (see ``systems.base.dataset_device_arrays``)."""
    from instant_nsr_pl_tpu.systems.base import dataset_device_arrays

    return dataset_device_arrays(dataset)


class Trainer:
    def __init__(self, config, exp_dir, runs_dir=None, loggers=None):
        self.config = config
        tcfg = config.trainer
        self.max_steps = int(tcfg.max_steps)
        self.log_every_n_steps = int(tcfg.get("log_every_n_steps", 100))
        self.val_check_interval = int(tcfg.get("val_check_interval", 0) or 0)
        self.limit_val_batches = int(tcfg.get("limit_val_batches", 0) or 1 << 30)
        self.ckpt_every = int(
            config.get("checkpoint", {}).get("every_n_train_steps", self.max_steps)
        )
        # reference checkpoint.save_top_k semantics with monitor=None
        # (launch.py:72-75): -1 keeps every checkpoint, 0 disables saving,
        # k>0 keeps only the k most recent
        self.save_top_k = int(config.get("checkpoint", {}).get("save_top_k", -1))
        # reference trainer.num_sanity_val_steps (configs set 0): render N
        # val images before training starts to fail fast on eval-path bugs
        self.num_sanity_val_steps = int(tcfg.get("num_sanity_val_steps", 0))
        if float(tcfg.get("limit_train_batches", 1.0)) != 1.0:
            import warnings

            warnings.warn(
                "trainer.limit_train_batches != 1.0 has no effect: training "
                "is step-based (max_steps), there is no epoch to limit"
            )
        self.exp_dir = exp_dir
        self.save_dir = os.path.join(exp_dir, "save")
        self.ckpt_dir = os.path.join(exp_dir, "ckpt")
        os.makedirs(self.save_dir, exist_ok=True)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        # multi-process runs: rank 0 owns logging, checkpoints and artifact
        # files (the torch DDP rank-zero contract); every process still runs
        # the full compute path (renders are collective over the mesh).
        import jax

        self.is_main = jax.process_index() == 0
        if loggers is None:
            if self.is_main:
                tb_dir = runs_dir or os.path.join(exp_dir, "tb_logs")
                loggers = [
                    TensorBoardLogger(tb_dir),
                    CSVLogger(os.path.join(exp_dir, "csv_logs")),
                    ConsoleLogger(interval=self.log_every_n_steps),
                ]
            else:
                loggers = []
        self.loggers = loggers

    def _log(self, metrics, step):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    # -- fit ---------------------------------------------------------------
    def fit(self, system, dm, resume=None, resume_weights_only=False):
        dm.setup("fit")
        system.setup_data(dm.train)
        state = system.init_state(seed=int(self.config.get("seed", 42)))
        if resume:
            if resume_weights_only:
                state = load_weights_only(resume, state)
            else:
                state = load_checkpoint(resume, state)
            # under a multi-process mesh the loaded leaves are host-local;
            # re-globalize so the sharded train plan accepts them (no-op
            # single-process)
            state = system._globalize(state)
        val_data = data_arrays(dm.val)

        # optional profiler capture (reference has no profiler integration;
        # rays/s is the north-star metric so we add one): trainer.profile
        # gives a step range traced into <exp_dir>/profile
        profile_cfg = self.config.trainer.get("profile", None)
        prof_range = tuple(profile_cfg) if profile_cfg else None

        if self.num_sanity_val_steps:
            n = min(int(val_data["images"].shape[0]), self.num_sanity_val_steps)
            for i in range(n):
                system.evaluate_image(state, i, data=val_data)

        start_step = int(state["step"])
        t0 = time.time()
        fit_t0 = time.time()
        aux_secs = 0.0  # val + checkpoint time, excluded from the train wall
        rays_done = 0
        # host-side step counter: fetching state["step"] per step would sync
        # the device every iteration (costly over the TPU tunnel). Steps run
        # as scan megasteps (system.train_chunk) between host boundaries
        # (log / val / ckpt cadences) — one dispatch per grid-update interval
        # instead of per step. Profiling keeps the per-step loop so the trace
        # brackets exact step numbers.
        intervals = [
            iv
            for iv in (
                self.log_every_n_steps,
                self.val_check_interval,
                self.ckpt_every,
            )
            if iv
        ]
        step = start_step
        while step < self.max_steps:
            nxt = min(
                [((step // iv) + 1) * iv for iv in intervals]
                + [self.max_steps]
            )
            if prof_range and step < prof_range[1] and nxt > prof_range[0]:
                for s in range(step + 1, nxt + 1):
                    if s - 1 == prof_range[0]:
                        import jax

                        jax.profiler.start_trace(
                            os.path.join(self.exp_dir, "profile")
                        )
                    state, metrics = system.train_step(state)
                    if s == prof_range[1]:
                        import jax

                        jax.profiler.stop_trace()
            else:
                state, metrics = system.train_chunk(state, nxt - step)
            rays_done += system.active_num_rays * (nxt - step)
            step = nxt
            if step % self.log_every_n_steps == 0 or step == self.max_steps:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                metrics["train/rays_per_sec"] = rays_done / max(dt, 1e-9)
                metrics["train/num_rays"] = system.active_num_rays
                t0, rays_done = time.time(), 0
                self._log(metrics, step)
                # dynamic ray batching (bucketed; reference systems/nerf.py:93-95)
                system.adapt_num_rays(metrics.get("train/num_samples", 0.0))
            # checkpoint BEFORE validation: a kill during a long val render
            # (e.g. the stall watchdog) then resumes at this step instead of
            # retraining the whole cadence interval
            if self.ckpt_every and step % self.ckpt_every == 0:
                ta = time.time()
                self.save(system, state, step)
                aux_secs += time.time() - ta
            if self.val_check_interval and step % self.val_check_interval == 0:
                ta = time.time()
                self._run_validation(system, state, val_data, step)
                aux_secs += time.time() - ta
        if (
            self.val_check_interval
            and start_step >= self.max_steps
            and self.max_steps % self.val_check_interval == 0
        ):
            # resumed AT max_steps (e.g. watchdog killed the final val):
            # the loop above never ran, so run the final validation here
            ta = time.time()
            self._run_validation(system, state, val_data, int(state["step"]))
            aux_secs += time.time() - ta
        self.save(system, state, int(state["step"]))
        # measured walls (VERDICT r3 #7): fit = everything from resume point
        # to final save; train = fit minus val renders + checkpoints (still
        # includes any compile not served by the persistent cache)
        wall = time.time() - fit_t0
        self._log(
            {
                "train/fit_wall_secs": wall,
                "train/train_wall_secs": wall - aux_secs,
                "train/fit_start_step": float(start_step),
            },
            int(state["step"]),
        )
        return state

    def _run_validation(self, system, state, val_data, step):
        n = min(int(val_data["images"].shape[0]), self.limit_val_batches)
        psnrs, ssims = [], []
        for i in range(n):
            res = system.evaluate_image(state, i, data=val_data)
            psnrs.append(res["psnr"])
            ssims.append(res["ssim"])
            if self.is_main:
                specs = system.image_grid_specs(res)
                savers.save_image_grid(
                    self.save_dir, f"it{step}-{i}.png", specs
                )
                # per-view line: mean PSNR hides single-view collapses
                # (round-4 diagnosis: one view at 15 dB inside a 29.7 mean)
                print(
                    f"[val] view {i}: psnr={float(res['psnr']):.2f} "
                    f"ssim={float(res['ssim']):.4f}",
                    flush=True,
                )
        self._log(
            {"val/psnr": float(np.mean(psnrs)), "val/ssim": float(np.mean(ssims))},
            step,
        )
        return float(np.mean(psnrs))

    # -- validate / test / predict ----------------------------------------
    def validate(self, system, dm, state):
        dm.setup("validate")
        data = data_arrays(dm.val)
        step = int(state["step"])
        return self._run_validation(system, state, data, step)

    def test(self, system, dm, state):
        dm.setup("test")
        data = data_arrays(dm.test)
        step = int(state["step"])
        n = int(data["images"].shape[0])
        psnrs, ssims = [], []
        for i in range(n):
            # restart resumability: a watchdog restart resumes into the SAME
            # trial dir (launch.py); views already rendered (png + metrics
            # sidecar) are skipped, so a tunnel stall mid-test loses one
            # view instead of the whole sweep. Single-process only: under a
            # multi-process mesh the skip decision is a per-rank filesystem
            # check, and ranks disagreeing (non-shared fs, write races)
            # would deadlock the collective render.
            png = os.path.join(self.save_dir, f"it{step}-test", f"{i}.png")
            sidecar = png[:-4] + ".json"
            if (
                jax.process_count() == 1
                and os.path.exists(png)
                and os.path.exists(sidecar)
            ):
                with open(sidecar) as f:
                    cached = json.load(f)
                psnrs.append(cached["psnr"])
                ssims.append(cached["ssim"])
                print(f"[test] view {i}: cached ({png})", flush=True)
                continue
            res = system.evaluate_image(state, i, data=data)
            psnrs.append(res["psnr"])
            ssims.append(res["ssim"])
            if self.is_main:
                specs = system.image_grid_specs(res)
                savers.save_image_grid(
                    self.save_dir, f"it{step}-test/{i}.png", specs
                )
                with open(sidecar, "w") as f:
                    json.dump(
                        {"psnr": float(res["psnr"]), "ssim": float(res["ssim"])},
                        f,
                    )
                print(
                    f"[test] view {i}: psnr={float(res['psnr']):.2f} "
                    f"ssim={float(res['ssim']):.4f}",
                    flush=True,
                )
        psnr = float(np.mean(psnrs))
        self._log({"test/psnr": psnr, "test/ssim": float(np.mean(ssims))}, step)
        if self.is_main:
            savers.save_img_sequence(
                self.save_dir,
                f"it{step}-test",
                os.path.join(self.save_dir, f"it{step}-test"),
                r"(\d+)\.png",
                save_format=self.config.trainer.get("video_format", "mp4"),
                fps=30,
            )
        self.export(system, state)
        return psnr

    def predict(self, system, dm, state):
        """Render the dataset's predict split (the TRAIN split's camera
        trajectory per the reference: datasets/blender.py:109-110,
        dtu.py:175-176, colmap.py:306-307; dispatched at launch.py:119-121).
        The reference's PL predict loop renders these views and returns
        them uncollected; here the frames are saved plus a video —
        a useful superset of the same data contract. No metrics: predict
        has no GT comparison in the reference."""
        dm.setup("predict")
        data = data_arrays(dm.predict)
        step = int(state["step"])
        n = int(data["images"].shape[0])
        for i in range(n):
            images = system.render_image(state, i, data=data)
            if self.is_main:
                savers.save_image_grid(
                    self.save_dir,
                    f"it{step}-predict/{i}.png",
                    [{"type": "rgb", "img": images["comp_rgb"]}],
                )
        if self.is_main:
            savers.save_img_sequence(
                self.save_dir,
                f"it{step}-predict",
                os.path.join(self.save_dir, f"it{step}-predict"),
                r"(\d+)\.png",
                save_format=self.config.trainer.get("video_format", "mp4"),
                fps=30,
            )
        return n

    def export(self, system, state):
        """Mesh export (reference systems/nerf.py:213-218)."""
        export_cfg = self.config.get("export", {})
        mesh = system.model.export(
            state["params"], export_cfg, step=state["step"]
        )
        step = int(state["step"])
        if self.is_main:
            savers.save_obj(
                self.save_dir,
                f"it{step}-{self.config.model.get('name', 'model')}.obj",
                mesh["v_pos"],
                mesh["t_pos_idx"],
                v_rgb=mesh.get("v_rgb"),
            )
        return mesh

    def save(self, system, state, step):
        if not self.is_main or self.save_top_k == 0:
            return None
        path = save_checkpoint(
            os.path.join(self.ckpt_dir, f"step={step}.ckpt.npz"), state
        )
        if self.save_top_k > 0:
            kept = sorted(
                (
                    f
                    for f in os.listdir(self.ckpt_dir)
                    if f.startswith("step=") and f.endswith(".ckpt.npz")
                ),
                key=lambda f: int(f[len("step="):].split(".")[0]),
            )
            for old in kept[: -self.save_top_k]:
                os.remove(os.path.join(self.ckpt_dir, old))
        return path
