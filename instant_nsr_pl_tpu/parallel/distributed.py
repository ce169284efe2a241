"""Multi-process (multi-host) runtime wiring.

The reference spans hosts through torch DDP + NCCL, discovering its rank
from environment variables (reference utils/misc.py:42-50, launch.py:98).
The TPU-native equivalent is JAX multi-controller: every host runs this
same program, `jax.distributed.initialize()` connects them, and a single
global mesh spans every chip in the pod slice; collectives ride ICI within
a slice and DCN across slices. Nothing about the shard_map training plan
changes — a 1-host mesh and an N-host mesh are the same program.

Rank discovery mirrors the reference's env-var contract: explicit args
win, then ``NSR_COORDINATOR`` / ``NSR_NUM_PROCESSES`` / ``NSR_PROCESS_ID``
env vars (set by a pod launcher), then JAX's own auto-detection (TPU pod
metadata; no-op single-process otherwise).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Call ``jax.distributed.initialize`` when a multi-process run is
    requested. Must run before the first JAX computation. Returns True if
    distributed mode was initialized.

    Single-process runs (no args, no env, not on a pod) are a no-op: we do
    NOT unconditionally call ``initialize()`` because on a single host it
    would still start a coordinator service.
    """
    coordinator = coordinator or os.environ.get("NSR_COORDINATOR")
    if num_processes is None and "NSR_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NSR_NUM_PROCESSES"])
    if process_id is None and "NSR_PROCESS_ID" in os.environ:
        process_id = int(os.environ["NSR_PROCESS_ID"])
    if local_device_ids is None and "NSR_LOCAL_DEVICE_IDS" in os.environ:
        local_device_ids = [
            int(x) for x in os.environ["NSR_LOCAL_DEVICE_IDS"].split(",")
        ]

    import jax

    if coordinator is None and num_processes is None:
        # TPU pod slices self-discover through the runtime metadata; only
        # engage when the environment says we're actually on a MULTI-host
        # slice (a single-host TPU VM also sets TPU_WORKER_HOSTNAMES).
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len(hostnames.split(",")) > 1 or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            jax.distributed.initialize()
            return True
        return False

    if num_processes is None or process_id is None:
        raise ValueError(
            "multi-process launch needs coordinator + num_processes + "
            "process_id (flags or NSR_* env vars)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def replicate_to_mesh(tree, mesh):
    """Make every array in ``tree`` a fully-replicated global ``jax.Array``
    over ``mesh``.

    Under multi-controller JAX, arrays committed to one process's local
    device cannot feed a jit spanning the global mesh; host-local (numpy)
    data is assumed identical across processes — true here because every
    process seeds identically and loads the same dataset (the same
    assumption torch DDP makes about replicated module state).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "sharding") and not isinstance(x, np.ndarray):
            # already a jax.Array: fetch to host first if it is committed to
            # a device layout that doesn't span the mesh
            if getattr(x, "sharding", None) == sharding:
                return x
            x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)
