"""Experiment bookkeeping callbacks: code + config snapshots.

Re-implements the reference's CodeSnapshotCallback / ConfigSnapshotCallback
(utils/callbacks.py:16-91): at fit start, the tracked source tree and the
parsed + raw configs are copied into the experiment directory so every run is
reproducible from its own folder.
"""

from __future__ import annotations

import os
import shutil
import subprocess

from instant_nsr_pl_tpu.config import dump_config


def snapshot_code(dest_dir, repo_root=None):
    """Copy all git-tracked files into ``dest_dir`` (reference
    utils/callbacks.py:58-76)."""
    repo_root = repo_root or os.getcwd()
    try:
        out = subprocess.run(
            ["git", "ls-files"],
            cwd=repo_root,
            check=True,
            capture_output=True,
            text=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.makedirs(dest_dir, exist_ok=True)
    for rel in out.splitlines():
        src = os.path.join(repo_root, rel)
        if not os.path.isfile(src):
            continue
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
    return dest_dir


def snapshot_config(dest_dir, config, raw_config_path=None):
    """Dump the resolved config (+ copy the raw yaml) into ``dest_dir``
    (reference utils/callbacks.py:79-91)."""
    os.makedirs(dest_dir, exist_ok=True)
    dump_config(os.path.join(dest_dir, "parsed.yaml"), config)
    if raw_config_path and os.path.isfile(raw_config_path):
        shutil.copy2(raw_config_path, os.path.join(dest_dir, "raw.yaml"))
    return dest_dir
