"""xna_basecaller_tpu: TPU-native expanded-alphabet nanopore basecalling."""

import os

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """First compiles of the Pallas kernels cost minutes through a remote
    compile service; the persistent cache makes every later process start
    in seconds.  Opt out with XNACALL_NO_COMPILE_CACHE=1."""
    if os.environ.get("XNACALL_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
