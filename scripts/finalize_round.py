"""Round-closing checklist (VERDICT r6 item 8 + r7 item 1): regenerate
the derived artifacts that went stale exactly once each in r5/r6, FAIL
if any driver query is missing from them, and FAIL if the window
rotation rule is violated.

1. rotation rule    — via scripts/rotation_check.py: any query whose
                      exercised package symbols / builder / oracle
                      changed since its last green driver row must be
                      inside the first-50 window (stateless, from git).
2. ``PLANS.md``     — via scripts/plan_inventory.py; must contain one row
                      per ``__spark_entry__.queries()`` entry.
3. ``BASELINE_REPLICATION.json`` — via scripts/bench_baseline.py; must
                      parse and contain all three T1/T2/T3 workloads.

Run as the LAST commit of a round:  python scripts/finalize_round.py
(pass --skip-baseline to refresh only the plan inventory).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(script: str, *args: str) -> None:
    cmd = [sys.executable, os.path.join(REPO, "scripts", script), *args]
    print(f"--- {' '.join(cmd[1:])}")
    res = subprocess.run(cmd, cwd=REPO)
    if res.returncode != 0:
        sys.exit(f"FAIL: {script} exited {res.returncode}")


def main() -> None:
    skip_baseline = "--skip-baseline" in sys.argv

    import __spark_entry__ as entry
    names = list(entry.queries())

    run("rotation_check.py")
    run("plan_inventory.py")
    plans = open(os.path.join(REPO, "PLANS.md")).read()
    have = set(re.findall(r"^\| (\S+) \|", plans, re.M))
    missing = [q for q in names if q not in have]
    if missing:
        sys.exit(f"FAIL: PLANS.md missing {len(missing)} queries: {missing}")
    print(f"PLANS.md: {len(names)} / {len(names)} queries present")

    if not skip_baseline:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "bench_baseline.py")],
            cwd=REPO, capture_output=True, text=True)
        line = next((ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")), None)
        if out.returncode != 0 or line is None:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
            sys.exit("FAIL: bench_baseline.py produced no JSON")
        parsed = json.loads(line)
        workloads = parsed.get("workloads", parsed)
        for t in ("t1", "t2", "t3"):
            if not any(t in str(k).lower() for k in workloads):
                sys.exit(f"FAIL: baseline replication missing workload {t}")
        with open(os.path.join(REPO, "BASELINE_REPLICATION.json"), "w") as f:
            json.dump(parsed, f, indent=1)
        print("BASELINE_REPLICATION.json: T1/T2/T3 regenerated")

    print("FINALIZE OK")


if __name__ == "__main__":
    main()
