import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware (see repo build notes).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# belt and suspenders: the axon sitecustomize can re-register the TPU
# backend after env processing; the config knob wins over everything
jax.config.update("jax_platforms", "cpu")
