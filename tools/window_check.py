"""Mechanized window-rotation audit (r16): recompute the attestation
ledger from the union of all CORRECTNESS_r*.json and validate a driver
window against the rotation protocol — the same checks the judge runs
by hand each round, and the same arithmetic the session does before a
rotation commit.

    python tools/window_check.py                 # validate the ACTIVE window
    python tools/window_check.py --proposed a,b  # validate a comma-list instead
    python tools/window_check.py --json out.json

Checks (each prints PASS/FAIL; exit 1 on any FAIL):
  W1 window has exactly 50 unique names, all present in REGISTRY
  W2 REGISTRY's first 50 == the window, in order (active-window mode
     only — a proposed list is checked for content, not position)
  W3 the always-in-window single-query families are present
  W4 every never-attested non-terminal registry query is in-window
     (new registrations MUST take their first attestation immediately)
  W5 cadence: every non-terminal query OUTSIDE the window has a full
     attestation within the last MAX_AGE rounds (default 4) as of the
     newest CORRECTNESS round + 1 (the round the window will run in)
  W6 rotation priority: the window contains the ENTIRE oldest
     non-terminal tier or, if the tier is larger than the free slots,
     the overflow is reported by name (for COVERAGE.md's ledger notes)

The DECLARED-TERMINAL rows-only twins (adjudicated in prior rounds;
md5 siblings fully attested, twin parity pinned in
tests/test_twin_parity.py) are exempt from W4/W5.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALWAYS_IN_WINDOW = ("salted_hot_join", "zorder_skipping")
TERMINAL = frozenset({"simhash", "image_phash", "image_near_dup", "media_features"})
MAX_AGE = 4


def attestation_tiers(repo_root: str) -> tuple[dict[str, int], int]:
    """(query -> latest green attestation round, newest round seen).
    Green is tools/attestation_ledger.py's `_green` — imported, not
    copied, so the two audits can never drift."""
    from tools.attestation_ledger import _green

    latest: dict[str, int] = {}
    newest = 0
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        newest = max(newest, rnd)
        data = json.load(open(f))
        rows = data.get("queries", data) if isinstance(data, dict) else {}
        for name, v in rows.items():
            if isinstance(v, dict) and _green(v):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, newest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposed", default=None,
                    help="comma-separated window to validate instead of the active one")
    ap.add_argument("--max-age", type=int, default=MAX_AGE)
    ap.add_argument("--json", default=None, help="also write a JSON report here")
    args = ap.parse_args()

    from commerce_data_pipeline_spark.queries._registry import REGISTRY

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, newest = attestation_tiers(repo_root)
    running_round = newest + 1  # the round this window will be graded in

    # Which round was the ACTIVE window built for? The registry names it
    # (_WINDOW_R{N}); at the start of round N+1 the driver lands
    # CORRECTNESS_r{N} BEFORE the session rotates, so the active window
    # is legitimately one round stale until the rotation commit. In that
    # state W4/W5 report as ROTATION-DUE warnings, not failures — the
    # strict contract applies once window_round == running_round.
    src = open(os.path.join(
        repo_root, "commerce_data_pipeline_spark", "queries", "_registry.py"
    )).read()
    active_defs = re.findall(r"^_WINDOW_R(\d+) = \[", src, flags=re.M)
    window_round = max((int(n) for n in active_defs), default=None)

    registry_order = list(REGISTRY)
    if args.proposed:
        window = [n.strip() for n in args.proposed.split(",") if n.strip()]
        active_mode = False
    else:
        window = registry_order[:50]
        active_mode = True
    # a proposed window is always judged strictly (it is being validated
    # against the landed data for the upcoming rotation)
    strict = (not active_mode) or window_round is None or window_round >= running_round

    results: dict[str, dict] = {}
    failed = False

    def check(key: str, ok: bool, detail: str) -> None:
        nonlocal failed
        results[key] = {"ok": bool(ok), "detail": detail}
        print(f"{'PASS' if ok else 'FAIL'} {key}: {detail}")
        failed = failed or not ok

    missing = [n for n in window if n not in REGISTRY]
    check("W1_shape", len(window) == 50 and len(set(window)) == 50 and not missing,
          f"{len(window)} names, {len(set(window))} unique, "
          f"unknown={missing or 'none'}")

    if active_mode:
        check("W2_first50", registry_order[:50] == window,
              "REGISTRY first-50 equals the active window")
    else:
        results["W2_first50"] = {"ok": None, "detail": "skipped (proposed mode)"}
        print("SKIP W2_first50: proposed mode (position not checkable)")

    absent = [n for n in ALWAYS_IN_WINDOW if n not in window]
    check("W3_singles", not absent, f"always-in-window absent={absent or 'none'}")

    never = [n for n in REGISTRY
             if n not in latest and n not in TERMINAL and n not in window]
    stale = sorted(
        (n, latest[n]) for n in REGISTRY
        if n not in window and n not in TERMINAL and n in latest
        and running_round - latest[n] > args.max_age
    )
    if strict:
        check("W4_never_attested", not never,
              f"never-attested non-terminal outside window={never or 'none'}")
        check("W5_cadence", not stale,
              f"as of r{running_round} (newest attestation r{newest}), "
              f"out-of-window older than {args.max_age} rounds: "
              f"{stale or 'none'}")
    else:
        detail = (f"window is _WINDOW_R{window_round} but r{newest} already "
                  f"attested — ROTATION DUE; would-be W4={never or 'none'}, "
                  f"would-be W5={stale or 'none'}")
        results["W4_never_attested"] = {"ok": None, "detail": detail}
        results["W5_cadence"] = {"ok": None, "detail": detail}
        print(f"WARN rotation-due: {detail}")

    non_terminal_tiers = {n: r for n, r in latest.items()
                          if n in REGISTRY and n not in TERMINAL}
    if non_terminal_tiers:
        oldest = min(non_terminal_tiers.values())
        tier = sorted(n for n, r in non_terminal_tiers.items() if r == oldest)
        out = [n for n in tier if n not in window]
        ok = not out or len(tier) > sum(1 for n in window if n in tier)
        detail = (f"oldest tier r{oldest} has {len(tier)} queries; "
                  f"in-window {len(tier) - len(out)}; "
                  f"overflow (must lead the NEXT window): {out or 'none'}")
        # overflow is informational, not a failure — the protocol allows
        # a tier larger than the free slots as long as the overflow is
        # named and leads the next rotation
        results["W6_priority"] = {"ok": True, "detail": detail}
        print(f"INFO W6_priority: {detail}")

    report = {
        "mode": "active" if active_mode else "proposed",
        "newest_correctness_round": newest,
        "running_round": running_round,
        "window_round": window_round,
        "strict": strict,
        "registry_size": len(REGISTRY),
        "attested_ever": len([n for n in latest if n in REGISTRY]),
        "checks": results,
    }
    if args.json:
        json.dump(report, open(args.json, "w"), indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
