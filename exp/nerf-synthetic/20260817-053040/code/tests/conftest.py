"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the JAX-idiomatic
'multi-node without a cluster' — see SURVEY.md §4)."""

import os

# force CPU: the session env may point JAX at the tunneled TPU (axon), which
# would make unit tests crawl through the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; re-pin explicitly so tests never dispatch through the tunnel
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
