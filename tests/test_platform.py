"""Journal-compaction startup-env guarantee (ADVICE r3 medium).

The tunneled-TPU plugin captures its environment at interpreter start
(sitecustomize), so AXON_JOURNAL_COMPACT must be in the TRUE startup env
— a runtime setdefault from the package __init__ is too late.  The
package marks when IT set the variable (_XNACALL_JC_SETDEFAULT) and
ensure_tunnel_journal_compact() re-execs exactly when the startup env
lacked it.  These tests drive real subprocesses through that logic with
a fake tunnel indicator (PALLAS_AXON_POOL_IPS).
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""\
    import os, sys
    sys.path.insert(0, {repo!r})
    import xna_basecaller_tpu  # runs _bound_tunnel_journal()
    from xna_basecaller_tpu.utils.platform import (
        ensure_tunnel_journal_compact,
    )
    ensure_tunnel_journal_compact()
    print("compact=", os.environ.get("AXON_JOURNAL_COMPACT"),
          "marker=", 1 if xna_basecaller_tpu._JC_SETDEFAULT else None,
          "reexec=", os.environ.get("_XNACALL_JC_REEXEC"))
""").format(repo=REPO)


def _run(extra_env, tmp_path):
    script = tmp_path / "entry.py"
    script.write_text(SCRIPT)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("AXON_JOURNAL", "_XNACALL_JC",
                                "PALLAS_AXON_POOL_IPS"))}
    env.pop("XNACALL_NO_JOURNAL_COMPACT", None)
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, str(script)], env=env, cwd=str(tmp_path),
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


def test_reexec_when_var_missing_from_startup_env(tmp_path):
    # under the (fake) tunnel without the var: the entry point must
    # re-exec once, landing with the var in the true startup env and no
    # stale marker
    got = _run({"PALLAS_AXON_POOL_IPS": "1.2.3.4"}, tmp_path)
    assert got == "compact= 1 marker= None reexec= 1"


def test_no_reexec_when_launcher_exported_it(tmp_path):
    # run_supervised.sh-style launch: the var was in the startup env, so
    # the marker is never set and no re-exec happens
    got = _run({"PALLAS_AXON_POOL_IPS": "1.2.3.4",
                "AXON_JOURNAL_COMPACT": "1"}, tmp_path)
    assert got == "compact= 1 marker= None reexec= None"


def test_no_reexec_outside_tunnel(tmp_path):
    # no tunnel indicator: setdefault still applies (harmless) but the
    # process must not exec itself
    got = _run({}, tmp_path)
    assert got == "compact= 1 marker= 1 reexec= None"


def test_opt_out(tmp_path):
    got = _run({"PALLAS_AXON_POOL_IPS": "1.2.3.4",
                "XNACALL_NO_JOURNAL_COMPACT": "1"}, tmp_path)
    assert got == "compact= None marker= None reexec= None"


def test_children_of_non_reexeced_process_do_not_reexec(tmp_path):
    """A process that imported the package without re-exec'ing (e.g. a
    python -m entry point) passes AXON_JOURNAL_COMPACT=1 to children via
    its os.environ — the children's startup env genuinely has it, so
    they must NOT re-exec (the setdefault flag is per-process, never an
    inherited env marker)."""
    child = tmp_path / "entry.py"
    child.write_text(SCRIPT)
    parent = tmp_path / "parent.py"
    parent.write_text(textwrap.dedent("""\
        import os, subprocess, sys
        sys.path.insert(0, {repo!r})
        import xna_basecaller_tpu  # setdefaults the var in THIS process
        out = subprocess.run(
            [sys.executable, {child!r}], env=dict(os.environ),
            capture_output=True, text=True, timeout=60)
        sys.stdout.write(out.stdout)
    """).format(repo=REPO, child=str(child)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("AXON_JOURNAL", "_XNACALL_JC",
                                "PALLAS_AXON_POOL_IPS"))}
    env.pop("XNACALL_NO_JOURNAL_COMPACT", None)
    env["PALLAS_AXON_POOL_IPS"] = "1.2.3.4"
    out = subprocess.run(
        [sys.executable, str(parent)], env=env, cwd=str(tmp_path),
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "compact= 1 marker= None reexec= None"
