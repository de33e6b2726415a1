"""Persistent XLA compilation cache setup — first compile of the big models
is ~minutes over a remote-TPU tunnel; caching makes every later process
start warm."""
import os


def enable_persistent_cache(path=None):
    import jax
    path = path or os.environ.get(
        'SC2_TPU_JAX_CACHE', os.path.expanduser('~/.cache/jax_comp'))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:  # older jax w/o these flags: best-effort
        pass
