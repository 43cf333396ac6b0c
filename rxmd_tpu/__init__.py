"""rxmd-tpu: TPU-native reactive molecular dynamics (ReaxFF/QEq/PQEq)."""
import jax as _jax

# MD coordinate transforms (frac <-> real) and the dense QEq matvec are
# jnp matmuls; the TPU default bf16 matmul precision would round positions
# to ~0.01 A and break CG convergence.  All heavy compute here is
# elementwise/gather (unaffected), so forcing full precision costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the MD step is one large XLA program whose
# first compile takes minutes at production sizes; cache it across runs
# (CLI, bench, tests all share).  Mirrors the reference's ahead-of-time
# build model — compile once, run many.
import os as _os

_cache = _os.environ.get(
    "RXMD_TPU_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                  _os.pardir, ".jax_cache"))


def _arch_tag():
    """CPU-microarchitecture tag for the cache path: XLA:CPU AOT
    executables embed machine features and abort (SIGILL) when loaded on
    a host with different ones — cache entries must never cross hosts."""
    try:
        import hashlib
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return platform.machine()


_jax.config.update("jax_compilation_cache_dir",
                   _os.path.join(_os.path.abspath(_cache), _arch_tag()))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
