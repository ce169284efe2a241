"""Restart resumability (round-5): a --resume launch must reuse the
checkpoint's trial dir and skip test views already rendered there (png +
metrics sidecar), so a watchdog restart after a mid-test stall loses one
view instead of the whole sweep. Reference role: PL resume semantics
(launch.py:110-114) hardened for the tunnel-stall failure mode."""

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = [
    "--config", "configs/nerf-synthetic.yaml", "--train", "--platform", "cpu",
    "trainer.max_steps=30", "trainer.log_every_n_steps=30",
    "trainer.val_check_interval=30",
    "dataset.size=32", "dataset.n_test=2", "model.train_num_rays=64",
    "model.max_train_num_rays=64", "model.train_num_samples=1024",
    "model.num_samples_per_ray=16", "model.eval_chunk_rays=256",
    "model.eval_num_samples=8192", "model.grid_warmup_steps=8",
    "model.grid_update_every=8", "model.geometry.isosurface.resolution=8",
    "checkpoint.every_n_train_steps=30",
]


def _run(tmp, extra):
    return subprocess.run(
        [sys.executable, "launch.py", *ARGS, "--exp_dir", str(tmp), *extra],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )


def test_resume_reuses_trial_and_skips_cached_views(tmp_path):
    r = _run(tmp_path, [])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    trials = glob.glob(str(tmp_path / "nerf-synthetic" / "*"))
    assert len(trials) == 1
    test_dir = os.path.join(trials[0], "save", "it30-test")
    assert os.path.exists(os.path.join(test_dir, "0.json"))
    assert os.path.exists(os.path.join(test_dir, "1.png"))
    # drop view 1's artifacts: the resumed run must re-render ONLY view 1
    os.remove(os.path.join(test_dir, "1.png"))
    os.remove(os.path.join(test_dir, "1.json"))
    with open(os.path.join(test_dir, "0.json")) as f:
        psnr0 = json.load(f)["psnr"]

    ckpt = glob.glob(os.path.join(trials[0], "ckpt", "step=30.ckpt.npz"))[0]
    r2 = _run(tmp_path, ["--resume", ckpt])
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-2000:]
    # same trial dir reused (no second trial created)
    assert len(glob.glob(str(tmp_path / "nerf-synthetic" / "*"))) == 1
    assert "[test] view 0: cached" in r2.stdout
    assert "[test] view 1: cached" not in r2.stdout
    assert os.path.exists(os.path.join(test_dir, "1.json"))
    with open(os.path.join(test_dir, "0.json")) as f:
        assert json.load(f)["psnr"] == psnr0  # untouched cache


def test_resume_weights_only_gets_fresh_trial(tmp_path):
    r = _run(tmp_path, [])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    ckpt = glob.glob(str(tmp_path / "nerf-synthetic" / "*" / "ckpt" / "*.npz"))[0]
    r2 = _run(tmp_path, ["--resume", ckpt, "--resume_weights_only"])
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-2000:]
    # weights-only resume is a NEW experiment: fresh trial dir
    assert len(glob.glob(str(tmp_path / "nerf-synthetic" / "*"))) == 2
