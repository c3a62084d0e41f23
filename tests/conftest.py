"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Mirrors the multi-host-without-a-cluster strategy from SURVEY.md §4.4:
`--xla_force_host_platform_device_count=8` gives every test session a
deterministic 8-device mesh for sharding tests, with no TPU required.

The environment may pin JAX at a tunneled TPU (`jax_platforms=axon`) via a
sitecustomize hook that runs before this file and sets the *config* value
directly, so an env var is not enough — we override the config too.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
