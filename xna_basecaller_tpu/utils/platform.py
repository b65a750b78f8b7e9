"""Backend detection: choose Pallas TPU kernels vs pure-JAX fallbacks."""

from __future__ import annotations

import functools
import os
import sys

import jax


def env_flag(name: str, default: bool) -> bool:
    """Boolean env gate with uniform parsing across every XNACALL gate:
    '0', 'false', 'no', 'off' (case-insensitive) and the empty string
    disable; any other value enables; unset -> ``default``.

    The promoted default-ON training gates (XNACALL_PALLAS_LOSS,
    XNACALL_LSTM_CELL_RESID_BF16) previously parsed opposite ways
    ('anything-but-0' vs 'only-1'), so `=false` half-disabled the
    pair."""
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() not in ("0", "false", "no", "off", "")


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

    Importing this module runs the package __init__, whose
    _bound_tunnel_journal() setdefaults AXON_JOURNAL_COMPACT=1 — too
    late for the plugin, which captured its env at interpreter start.
    The __init__ therefore sets its module-level _JC_SETDEFAULT flag
    when it (rather than the launcher) set the variable; seeing either
    the flag or an unset variable here means the TRUE startup env
    lacked it and a re-exec is required.  (A process flag, not an env
    marker: children of a non-re-exec'd process inherit the variable in
    their genuine startup env and must not re-exec.)  Re-exec is
    skipped for ``python -m`` entry points (re-execing the module's
    __main__.py by path would break package-relative imports;
    __main__.__spec__ is set exactly in that case) — those launchers
    must export the variable themselves.
    """
    import xna_basecaller_tpu as _pkg

    started_without = (
        not os.environ.get("AXON_JOURNAL_COMPACT") or _pkg._JC_SETDEFAULT)
    main_spec = getattr(sys.modules.get("__main__"), "__spec__", None)
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            and started_without
            and not os.environ.get("XNACALL_NO_JOURNAL_COMPACT")
            and os.environ.get("_XNACALL_JC_REEXEC") != "1"
            and main_spec is None
            and sys.argv and sys.argv[0] and os.path.exists(sys.argv[0])):
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
