"""Persistent XLA compilation cache.

TPU compiles of the sprint programs through the axon service can take
minutes for some shapes (CPU compiles the same programs in ~2 s — the
cost is in the TPU backend passes).  A persistent on-disk cache makes
every compile a one-time cost across processes and driver rounds.
"""

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "MRI_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
