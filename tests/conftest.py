"""Test configuration: run on CPU with 8 virtual devices.

Pallas kernels run in interpret mode on CPU (selected automatically by the
kernel module); sharding tests use the 8-device virtual mesh.
"""

import os

# The harness presets JAX_PLATFORMS=axon (one real TPU chip); tests run on a
# virtual 8-device CPU mesh instead. Set TEST_ON_TPU=1 to run on the real chip.
if not os.environ.get("TEST_ON_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax  # noqa: E402

    # The axon plugin overrides the env var; the config flag wins.
    jax.config.update("jax_platforms", "cpu")
