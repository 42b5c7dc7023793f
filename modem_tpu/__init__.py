"""tpu-modem: TPU-native OFDM acoustic modem framework."""

import os as _os


def apply_env_platform() -> None:
    """Honor JAX_PLATFORMS at an entry point.

    A sitecustomize may import jax at interpreter start and pin the
    platform before env vars are read (the axon TPU plugin does this,
    and also writes JAX_PLATFORMS=axon into the env when the user left
    it unset — making this a no-op then).  Entry points (CLI, bench
    scripts, graft hooks) call this; it is NOT done on package import
    so an explicit jax.config.update("jax_platforms", ...) by embedding
    code (e.g. a test conftest) is never clobbered.
    """
    if "JAX_PLATFORMS" in _os.environ:
        try:
            import jax

            jax.config.update("jax_platforms",
                              _os.environ["JAX_PLATFORMS"])
        except Exception:  # pragma: no cover
            pass

# The SCL schedule VM compiles slowly (20k-instruction scan); persist
# compiled executables across processes.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        import jax as _jax

        _cache = _os.path.join(_os.path.dirname(__file__), "..",
                               ".jax_cache")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
