"""Single pre-commit gate: one command, non-zero exit on any flag.

Runs, in order (each in its own subprocess so every step gets a clean
JVM/session and one step's config can't mask another's failure):

1. ``tools/check_correctness.py`` — the full differential gate (every registered query) vs
   DuckDB at sf0.01 (mirrors the driver's CORRECTNESS_r{N}.json check).
2. ``tools/explain_audit.py`` — physical-plan scan of every query for
   scale red flags (row-at-a-time PythonUDF, CartesianProduct); fails on
   any ``FLAG``/``ERR`` line.
3. Vanilla-session driver simulation — imports ``__spark_entry__`` by
   file path from a non-repo cwd and runs ``entry()`` plus an
   events-table query on a bare ``local[8]`` session (catches configs
   that only exist in our ``get_spark()``).
4. ``bench.py`` smoke at sf0.001 — asserts exactly one JSON line with
   the driver's contract keys (BENCH_FULL.json is untouched: bench.py
   only persists the standing-record map at sf0.1).
5. ``tools/compat35_audit.py`` — the PySpark-3.5 surface ratchet
   (functions + object methods); fails on any unratcheted usage.
6. Round-artifact hygiene — fails on untracked or modified
   ``BENCH_r*.json`` / ``CORRECTNESS_r*.json`` / ``BENCH_FULL.json`` /
   ``BENCH_SWEEP.json`` (VERDICT r11/r12/r13 all flagged the same
   drift: an auditor cloning the repo at any commit must see the
   round's evidence).

Usage::

    python tools/gate.py            # full gate (~4 min)
    python tools/gate.py --fast     # steps 2-4 only (~1 min)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = "/root/repo"
PY = sys.executable


def run(
    name: str, argv: list[str], cwd: str = REPO, env: dict[str, str] | None = None
) -> tuple[bool, str]:
    print(f"== {name} ==", flush=True)
    full_env = dict(os.environ, **(env or {}))
    proc = subprocess.run(argv, cwd=cwd, capture_output=True, text=True, env=full_env)
    out = proc.stdout + proc.stderr
    return proc.returncode == 0, out


def main() -> int:
    fast = "--fast" in sys.argv
    failures: list[str] = []

    if not fast:
        ok, out = run(
            "correctness (sf0.01 vs DuckDB)",
            [PY, f"{REPO}/tools/check_correctness.py", "/root/testdata/sf0.01"],
        )
        tail = [l for l in out.splitlines() if l.startswith(("FAIL", "ALL", "   -"))]
        print("\n".join(tail[-12:]) or out[-2000:])
        if not ok or not any(l.startswith("ALL OK") for l in tail):
            failures.append("correctness")

    ok, out = run("plan audit", [PY, f"{REPO}/tools/explain_audit.py"])
    flagged = [l for l in out.splitlines() if l.startswith(("FLAG", "ERR"))]
    m = re.search(r"^(\d+) flagged$", out, re.MULTILINE)
    print("\n".join(flagged) or (m.group(0) if m else out[-2000:]))
    if not ok or m is None or m.group(1) != "0":
        failures.append("plan-audit")

    sim = (
        "import importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('__spark_entry__', '{REPO}/__spark_entry__.py')\n"
        "mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[8]').getOrCreate()\n"
        "assert mod.entry(spark).count() >= 0\n"
        "qs = mod.queries()\n"
        "assert qs['q_pit_join'](spark, '/root/testdata/sf0.001').count() > 0\n"
        "set(qs) >= set(mod.oracle_sql()) or (_ for _ in ()).throw(AssertionError('oracle keys not in queries'))\n"
        "print('DRIVER-SIM-OK')\n"
    )
    ok, out = run("vanilla driver sim", [PY, "-c", sim], cwd="/tmp")
    if not ok or "DRIVER-SIM-OK" not in out:
        print(out[-2000:])
        failures.append("driver-sim")
    else:
        print("DRIVER-SIM-OK")

    ok, out = run(
        "bench smoke (sf0.001)",
        [PY, f"{REPO}/bench.py"],
        # exercise the fork-mode orchestration itself (r13: full sweeps
        # run as fresh-JVM chunks) but bound the smoke to 2 chunks × 2
        # queries — the contract under test is the printed JSON line,
        # not the suite
        env={
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_BENCH_LIMIT": "4",
            "SPARK_GRAFT_BENCH_CHUNK": "2",
        },
    )
    payload = None
    for line in reversed(out.strip().splitlines()):
        try:
            candidate = json.loads(line)
        except Exception:
            continue
        if isinstance(candidate, dict) and {"metric", "value", "unit", "queries", "sf"} <= set(candidate):
            payload = candidate
            break
    if payload is not None:
        print(f"bench ok: {payload['value']} {payload['unit']}, "
              f"{len(payload['queries'])} queries")
    else:
        print(out.strip().splitlines()[-1][-2000:] if out.strip() else "(no output)")
        failures.append("bench")
    if not ok:
        failures.append("bench-exit")

    ok, out = run("3.5 compat ratchet", [PY, f"{REPO}/tools/compat35_audit.py"])
    last = out.strip().splitlines()[-1] if out.strip() else "(no output)"
    print(last)
    if not ok:
        failures.append("compat35")

    # round-artifact hygiene: the per-round evidence files must be
    # committed, not drifting in the working tree (recurring verdict item
    # r11-r13)
    print("== round-artifact hygiene ==", flush=True)
    proc = subprocess.run(
        ["git", "status", "--porcelain", "--",
         "BENCH_r*.json", "CORRECTNESS_r*.json", "PERF_r*.json",
         "VERIFY_r*.json", "VERDICT.md", "ADVICE.md", "BENCH_PROGRESS.json",
         "BENCH_FULL.json", "BENCH_SWEEP.json", "BASELINE.md", "SCALING.md"],
        cwd=REPO, capture_output=True, text=True,
    )
    drift = [l for l in proc.stdout.splitlines() if l.strip()]
    if drift:
        print("\n".join(drift))
        print("^ commit these round artifacts (driver evidence must live "
              "at every commit)")
        failures.append("artifact-drift")
    else:
        print("clean")

    print(f"\nGATE {'OK' if not failures else 'FAILED: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
