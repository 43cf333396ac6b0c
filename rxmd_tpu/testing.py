"""Helpers to force a pure-CPU JAX runtime for tests and host-side tools.

The deployment environment's sitecustomize pins jax_platforms="axon,cpu"
(TPU-first).  Call `use_cpu()` before the first JAX operation to run on host
CPU instead (optionally with N virtual devices for mesh tests)."""
import os


def use_cpu(n_devices: int = None, x64: bool = True):
    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)
    return jax
