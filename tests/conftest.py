"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile and execute without TPU hardware.

The axon sitecustomize registers the tunneled-TPU PJRT plugin at interpreter
startup (before conftest can touch the environment), so clearing env vars
here is too late; instead we steer platform *selection*, which happens
lazily at first backend use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
