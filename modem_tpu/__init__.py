"""tpu-modem: TPU-native OFDM acoustic modem framework."""

import os as _os

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
