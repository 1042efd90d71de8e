"""The mechanized window audit (tools/window_check.py) must hold on the
committed repo state at all times: a rotation commit that breaks the
protocol (wrong size, missing singles, never-attested query left
outside the window, cadence violation) turns the suite red, not just
the next judge pass. No Spark session needed."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_active_window_satisfies_protocol(tmp_path):
    out = tmp_path / "report.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "window_check.py"),
         "--json", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(out.read_text())
    assert report["mode"] == "active"
    for key in ("W1_shape", "W2_first50", "W3_singles"):
        assert report["checks"][key]["ok"] is True, (key, report["checks"][key])
    # W4/W5 are strict except in the one legitimate stale state: the
    # driver landed the round's CORRECTNESS file but the session has not
    # rotated yet (ok is None + strict false = rotation-due warning)
    for key in ("W4_never_attested", "W5_cadence"):
        ok = report["checks"][key]["ok"]
        assert ok is True or (ok is None and not report["strict"]), (
            key, report["checks"][key])


def test_proposed_mode_flags_unknown_names():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "window_check.py"),
         "--proposed", ",".join(["no_such_query"] * 50)],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 1
    assert "FAIL W1_shape" in proc.stdout
