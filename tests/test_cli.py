"""End-to-end CLI smoke (subprocess tier — each command owns its Ray
session exactly as a real operator invocation would): gen → run →
status → verify → stats → lag → window (tumbling + session) →
compact-binlog --keys → resumed run → fsck. Catches argparse wiring and
command-glue regressions the in-process suites can't see."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str) -> dict | list | None:
    """Invoke `python -m thor_ray <args>`; return the LAST JSON line."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "thor_ray", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert out.returncode == 0, f"{args}: {out.stderr[-2000:]}"
    # last parseable JSON value — commands print either one compact line
    # or a trailing pretty-printed block (status); Ray progress lines may
    # contain stray braces, so scan suffixes from the end
    lines = out.stdout.strip().splitlines()
    for i in range(len(lines) - 1, -1, -1):
        if not lines[i].lstrip().startswith(("{", "[")):
            continue
        try:
            return json.loads("\n".join(lines[i:]))
        except json.JSONDecodeError:
            continue
    return None


def test_cli_end_to_end(tmp_path):
    work = str(tmp_path)
    fix = os.path.join(work, "fix")
    lake = os.path.join(work, "lake")

    g = run_cli("gen", "--out", fix, "--n-keys", "500",
                "--n-events", "2000", "--shards", "3")
    assert g["max_lsn"] == 2000
    binlog = g["binlog_dir"]

    run_cli("run", "--lake", lake, "--binlog", binlog,
            "--base", g["base"], "--partitions", "4",
            "--epoch-size", "1000", "--num-cpus", "4")

    st = run_cli("status", "--lake", lake, "--binlog", binlog)
    assert st["partitions"] == 4 and st["watermark"]["min"] == 2000
    assert st["binlog"]["lag_events"] == 0

    v = run_cli("verify", "--lake", lake, "--binlog", binlog,
                "--base", g["base"], "--num-cpus", "4")
    assert v["match"] is True

    stats = run_cli("stats", "--lake", lake, "--num-cpus", "4")
    assert stats["rows"] > 0

    lag = run_cli("lag", "--lake", lake, "--binlog", binlog)
    assert isinstance(lag, list) and all(r["lag"] == 0 for r in lag)

    w = run_cli("window", "--binlog", binlog, "--out-dir",
                os.path.join(work, "wagg"), "--window-ms", "500",
                "--lateness-ms", "500", "--complete", "--num-cpus", "4")
    assert w["emitted_events"] + w["open_events"] > 0

    s = run_cli("window", "--binlog", binlog, "--out-dir",
                os.path.join(work, "sagg"), "--gap-ms", "100",
                "--complete", "--num-cpus", "4")
    assert s["emitted_events"] + s["open_events"] > 0

    kc = run_cli("compact-binlog", "--binlog", binlog, "--keys")
    assert 0 < kc["events_out"] <= kc["events_in"]

    # the lake resumes cleanly over the compacted log (watermarks intact)
    run_cli("run", "--lake", lake, "--binlog", binlog,
            "--partitions", "4", "--epoch-size", "1000",
            "--num-cpus", "4")
    st2 = run_cli("status", "--lake", lake, "--binlog", binlog)
    assert st2["watermark"]["min"] == 2000

    fs = run_cli("fsck", "--lake", lake)
    assert fs["ok"] is True
