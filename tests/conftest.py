"""Test configuration: force an 8-device virtual CPU mesh.

Distributed/sharding tests run on virtual CPU devices
(``xla_force_host_platform_device_count``) so DP/tile sharding and psum
accumulation are testable without a TPU pod.

Note: this environment's sitecustomize force-registers the remote-TPU
("axon") platform regardless of JAX_PLATFORMS, so we must also override
``jax.config`` after import — env vars alone are not enough, and every remote
dispatch costs seconds of tunnel latency.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
