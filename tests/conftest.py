"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform to present 8 XLA CPU devices (the driver's dryrun_multichip
does the same). The environment's axon sitecustomize pre-imports JAX with
the TPU platform forced, so we both set the env vars and override the
platform config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
