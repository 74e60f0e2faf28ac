"""Test config: run JAX on a fake 8-device CPU mesh (the TPU-world fake cluster).

The container's sitecustomize registers+imports the axon (remote TPU) PJRT
plugin before any user code runs, so env vars alone are too late — we must
flip the platform via jax.config (SURVEY.md §4 implication e).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
