"""Root conftest: force CPU + 8 virtual devices for the whole test session.

The environment may pre-register a TPU platform plugin (and import jax) before
conftest runs, so set both the env vars and the live jax config; backends
initialize lazily at first use, which is after this.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
