"""Backend detection: choose Pallas TPU kernels vs pure-JAX fallbacks."""

from __future__ import annotations

import functools
import os
import sys

import jax


def ensure_tunnel_journal_compact() -> None:
    """Re-exec once with AXON_JOURNAL_COMPACT=1 when running under the
    tunneled TPU environment without it.

    The tunnel plugin registers at interpreter start (sitecustomize on
    PYTHONPATH) and captures its env then — a runtime setdefault can be
    too late, and without journal compaction the client retains
    ~|params| host RSS per dispatch (measured 94 MB/step; a long
    basecall run OOMed at 130 GB) and slows ~3x as the journal grows.
    Call this at the TOP of long-running entry points (bench, CLI,
    chain scripts) — never from library import paths (exec would
    restart an embedding process such as a REPL).
    """
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            and not os.environ.get("AXON_JOURNAL_COMPACT")
            and not os.environ.get("XNACALL_NO_JOURNAL_COMPACT")
            and os.environ.get("_XNACALL_JC_REEXEC") != "1"
            and sys.argv and sys.argv[0]):
        env = dict(os.environ,
                   AXON_JOURNAL_COMPACT="1", _XNACALL_JC_REEXEC="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


@functools.cache
def is_tpu() -> bool:
    """True when the default backend is a TPU (incl. tunneled 'axon')."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
