"""Test configuration: run on CPU with 8 virtual devices and f64 enabled.

The environment's sitecustomize force-selects the axon TPU backend
(jax_platforms="axon,cpu"); we override to pure CPU *before* any backend is
initialized.  The multi-device tests exercise the same shard_map code paths
that run on a real TPU slice (the JAX analog of the reference's `nompi`
serial backend is a 1-device mesh — same code path by construction,
ref: nompi.f90).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the sharded-engine tests compile large
# shard_map programs; caching makes repeat suite runs minutes faster
from rxmd_tpu import _arch_tag    # cache keyed by CPU uarch: foreign
_cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache",
                      _arch_tag())  # AOT entries abort (SIGILL) on load
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REF = "/root/reference"
