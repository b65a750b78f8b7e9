"""xna_basecaller_tpu: TPU-native expanded-alphabet nanopore basecalling."""

import os

__version__ = "0.1.0"

# True when THIS import (not the launcher) setdefaulted
# AXON_JOURNAL_COMPACT — i.e. the true startup env lacked it (see
# _bound_tunnel_journal / utils.platform.ensure_tunnel_journal_compact).
_JC_SETDEFAULT = False


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


def _bound_tunnel_journal():
    """The axon (tunneled TPU) client journals every execution's argument
    buffers for replay-on-reconnect; without compaction the journal
    retains ~|params| host RSS PER EXECUTION (~94 MB/step for the
    flagship — measured OOM at 130 GB on a 96k-read basecall run) and
    slows dispatch ~3x as it grows.  Compaction bounds it and removes
    the leak entirely.

    This setdefault is BEST-EFFORT: the plugin registers at interpreter
    start (sitecustomize) and can capture its env before this import
    runs.  When the variable was NOT already in the startup env, the
    module-level _JC_SETDEFAULT flag records that it was this import
    (not the launcher) that set it, so
    utils.platform.ensure_tunnel_journal_compact() knows a re-exec is
    still required to get it into the TRUE startup env.  (A flag, not an
    env marker: an env marker would leak to child processes whose
    startup env genuinely has the variable and re-exec them
    pointlessly.)  Long-run shells should export AXON_JOURNAL_COMPACT=1
    (run_supervised.sh does).  Opt out with
    XNACALL_NO_JOURNAL_COMPACT=1."""
    global _JC_SETDEFAULT
    if os.environ.get("XNACALL_NO_JOURNAL_COMPACT"):
        return
    if "AXON_JOURNAL_COMPACT" not in os.environ:
        os.environ["AXON_JOURNAL_COMPACT"] = "1"
        _JC_SETDEFAULT = True


_bound_tunnel_journal()
_enable_persistent_compile_cache()
