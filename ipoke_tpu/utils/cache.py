"""Persistent XLA compilation cache setup.

jax 0.9.0 does NOT honor the ``JAX_COMPILATION_CACHE_DIR`` environment
variable (verified on this host: a compile with the env var set writes no
cache dir; ``jax.config.update("jax_compilation_cache_dir", ...)`` does).
Every bench/driver entry point therefore calls :func:`enable` right after
importing jax, before the first compile.

The cache is backend-keyed, so CPU-mesh dryrun compiles and TPU bench
compiles coexist in one directory.  Whether the remote-TPU "axon" compile
path consults it is measured, not assumed — see NOTES.md.
"""
import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(cache_dir: str = None, min_compile_time_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Call after ``import jax`` and before the first compile.  Returns the
    directory used.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    return cache_dir
