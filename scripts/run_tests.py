"""Chunked test-suite runner: one pytest subprocess per test file.

Why this exists: on some sandboxed hosts a single-process
``pytest tests/`` run of the full suite dies silently mid-run (observed
twice in round-4 judging: killed ~10-13 min in with no traceback and no
summary — most likely an external supervisor reaping the long-lived
process; RAM was ample and the conftest forces the CPU backend, so it is
not the TPU tunnel).  Running each test FILE in its own subprocess keeps
every process short-lived and always yields a complete pass/fail tally
even when one chunk is killed: a killed chunk is reported as CRASHED with
its exit code instead of vanishing.

Usage:
    python scripts/run_tests.py              # full suite, per-file chunks
    python scripts/run_tests.py -m "not slow"   # forward marker filters
    python scripts/run_tests.py test_ops test_dct   # subset by file stem

Exit code 0 iff every chunk passed.  A per-file timeout (TEST_TIMEOUT
seconds, default 1200) converts a hung chunk into a visible failure.
"""

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
TIMEOUT = int(os.environ.get("TEST_TIMEOUT", "1200"))
SUMMARY_RE = re.compile(r"(\d+) (passed|failed|skipped|error|errors|xfailed|xpassed)")


def main() -> int:
    extra, stems = [], []
    args = iter(sys.argv[1:])
    for a in args:
        if a == "-m":
            extra += ["-m", next(args)]
        elif a.startswith("-"):
            extra.append(a)
        else:
            stems.append(a.removesuffix(".py"))

    files = sorted(
        f for f in os.listdir(TESTS) if f.startswith("test_") and f.endswith(".py")
    )
    if stems:
        files = [f for f in files if f.removesuffix(".py") in stems]
    if not files:
        print("no test files matched", file=sys.stderr)
        return 2

    totals = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    crashed, failed_files = [], []
    t_start = time.time()
    for f in files:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", os.path.join("tests", f), "-q"] + extra,
                cwd=REPO,
                capture_output=True,
                text=True,
                timeout=TIMEOUT,
            )
            out = proc.stdout + proc.stderr
            rc = proc.returncode
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or ""))
            rc = -9
            print(f"TIMEOUT after {TIMEOUT}s: {f}")
        counts = {}
        for num, kind in SUMMARY_RE.findall(out):
            kind = {"error": "errors"}.get(kind, kind)
            if kind in totals:
                counts[kind] = counts.get(kind, 0) + int(num)
        for k, v in counts.items():
            totals[k] += v
        dt = time.time() - t0
        # rc 5 = "no tests ran" (all deselected by -m) — not a failure
        if rc == 0 or (rc == 5 and not counts.get("failed")):
            status = "ok"
        elif counts:
            status = f"FAIL rc={rc}"
            failed_files.append(f)
        else:
            status = f"CRASHED rc={rc} (no pytest summary)"
            crashed.append(f)
            tail = "\n".join(out.strip().splitlines()[-15:])
            if tail:
                print(f"--- {f} output tail ---\n{tail}\n---")
        cstr = " ".join(f"{v} {k}" for k, v in counts.items()) or "-"
        print(f"[{dt:6.1f}s] {f:<28} {status:<28} {cstr}", flush=True)

    total_dt = time.time() - t_start
    print(
        f"\nTOTAL: {totals['passed']} passed, {totals['failed']} failed, "
        f"{totals['skipped']} skipped, {totals['errors']} errors, "
        f"{len(crashed)} crashed chunks in {total_dt / 60:.1f} min"
    )
    if failed_files:
        print("failed files:", ", ".join(failed_files))
    if crashed:
        print("crashed files (re-run individually):", ", ".join(crashed))
    return 0 if not failed_files and not crashed and totals["failed"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
