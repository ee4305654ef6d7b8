#!/usr/bin/env python
"""Solo-rerun protocol for suspicious bench times (r4 verdict item 7).

The driver benches all queries in one session; on this host the CPU drifts
30-40% intra-day AND an in-suite query can inherit noise from its
neighbors (GC, page-cache eviction, a cold Arrow worker). Rounds 3-4 each
burned investigation time on tpch_q18/q10 "regressions" that were exactly
this. Protocol, run it instead of eyeballing:

    python scripts/bench_triage.py BENCH_r5.json [bench_r5_local.json]

1. Compare the driver's per-query times against the tracked local snapshot
   (default: the newest ``bench_r*_local.json``); flag any query whose
   driver time exceeds ``3x`` its tracked local time (and at least 0.5 s
   absolute, so micro-queries don't trip on jitter).
2. Rerun each flagged query SOLO (fresh bench.py invocation per query, so
   it gets the full warm-up and no in-suite neighbors), recording
   ``host_probe_sec`` alongside.
3. Verdict per query: ``host_drift`` if the solo normalized time is within
   1.5x of the tracked local normalized time, else ``real_regression``.

Exit code 1 only on real regressions — host drift is reported, not fatal.

SNAPSHOT-REFRESH PROTOCOL (round 8; see bench.py's docstring for the full
statement): a new tracked snapshot needs three same-day clean runs within
~1.3x of each other; commit the lowest-total run and note the other two.
The former ``host_parallel_eff >= 0.8`` precondition is retired — the
bench run itself collapses that probe, so the gate could never fire.
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

RATIO = 3.0
ABS_FLOOR_SEC = 0.5
SOLO_TOLERANCE = 1.5
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _norm(times: dict, probe: float, ref: float) -> dict:
    return {q: t * ref / probe for q, t in times.items() if t != float("inf")}


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    driver = json.load(open(sys.argv[1]))
    if "queries" not in driver:
        # driver-side BENCH_r{N}.json format: our stdout JSON line survives
        # only as a 2000-char "tail" (with "parsed" null when the line is
        # longer); recover what we can — per-query times via regex, probe
        # via its named key
        import re

        tail = driver.get("parsed") or {}
        if isinstance(tail, dict) and "qt" in tail:
            # r9+ compact line: "qt" carries EVERY per-query time in
            # execution order; zip with the current registry order (the
            # sha8 pin catches a registry drift between run and triage).
            import hashlib
            sys.path.insert(0, REPO)
            import __spark_entry__ as entry

            names = list(entry.queries())
            sha8 = hashlib.sha256("\n".join(names).encode()).hexdigest()[:8]
            if sha8 == tail.get("qt_names_sha8") and len(names) == len(
                tail["qt"]
            ):
                tail = dict(tail)
                tail["queries"] = {
                    n: (float("inf") if t is None else t)
                    for n, t in zip(names, tail["qt"])
                }
                driver = tail
            else:
                print(
                    "# qt order hash mismatch (registry changed since the "
                    "run?) — falling back to the named slowest subset"
                )
                driver = tail
        elif isinstance(tail, dict) and "queries" in tail:
            driver = tail
        else:
            text = driver.get("tail", "")
            qtimes = {
                m.group(1): float(m.group(2))
                for m in re.finditer(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', text)
                if m.group(1)
                not in (
                    "sf", "host_probe_sec", "host_probe_ref_sec",
                    "host_parallel_eff", "value_normalized", "value",
                    "n", "rc", "cpus",
                )
            }
            probe_m = re.search(r'"host_probe_sec":\s*([0-9.]+)', text)
            driver = {
                "queries": qtimes,
                "host_probe_sec": float(probe_m.group(1)) if probe_m else None,
            }
            print(
                f"# driver file had no parsed JSON; recovered "
                f"{len(qtimes)} query times from the tail capture"
            )
    if len(sys.argv) > 2:
        local_path = sys.argv[2]
    else:
        # numeric round sort: lexicographic would pick r9 over r10
        import re as _re

        def _round_no(path):
            m = _re.search(r"bench_r(\d+)_local", path)
            return int(m.group(1)) if m else -1

        snaps = sorted(
            glob.glob(os.path.join(REPO, "bench_r*_local.json")), key=_round_no
        )
        if not snaps:
            print("no tracked bench_r*_local.json snapshot found")
            sys.exit(2)
        local_path = snaps[-1]
    local = json.load(open(local_path))
    ref = local.get("host_probe_ref_sec", 1.17)
    lnorm = _norm(local["queries"], local.get("host_probe_sec", ref), ref)
    dprobe = driver.get("host_probe_sec")
    dnorm = (
        _norm(driver["queries"], dprobe, ref)
        if dprobe
        else {q: t for q, t in driver["queries"].items() if t != float("inf")}
    )

    flagged = []
    for q, dt in dnorm.items():
        lt = lnorm.get(q)
        if lt is None:
            continue
        if dt > RATIO * lt and dt - lt > ABS_FLOOR_SEC:
            flagged.append((q, lt, dt))
    if not flagged:
        print(f"no query exceeds {RATIO}x its tracked local time ({local_path})")
        return

    print(f"{len(flagged)} flagged vs {local_path}; solo-rerunning each:")

    def solo_norm(q):
        # run the query THRICE in one session and take the min execution:
        # run 1 pays per-query codegen the in-suite run amortized across
        # same-family neighbors; runs 2-3 are steady state, and min
        # de-noises one-off GC pauses / host hiccups (a 2 s query measured
        # 22 s once during protocol development — transient, gone on rerun)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), q, q, q],
            capture_output=True, text=True, cwd=REPO,
        )
        import re

        runs = [
            float(m.group(1))
            for m in re.finditer(
                rf"^# {re.escape(q)}: ([0-9.]+)s", out.stderr, re.M
            )
        ]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not runs or not line:
            return None, out.stderr[-500:]
        solo = json.loads(line[-1])
        sprobe = solo.get("host_probe_sec", ref)
        eff = solo.get("host_parallel_eff")
        if eff is not None and eff < 0.7:
            print(f"  # {q}: host_parallel_eff={eff} — SMP throttled, "
                  "verdict unreliable; rerun when healthy")
        return min(runs) * ref / sprobe, sprobe

    verdicts = {}
    for q, lt, dt in flagged:
        st, sprobe = solo_norm(q)
        if st is None:
            verdicts[q] = {"verdict": "solo_run_failed", "stderr": sprobe}
            continue
        if st > SOLO_TOLERANCE * lt:
            st2, sprobe2 = solo_norm(q)  # one retry before crying regression
            if st2 is not None and st2 < st:
                st, sprobe = st2, sprobe2
        verdict = "host_drift" if st <= SOLO_TOLERANCE * lt else "real_regression"
        verdicts[q] = {
            "tracked_local_norm_sec": round(lt, 3),
            "driver_norm_sec": round(dt, 3),
            "solo_norm_sec": round(st, 3),
            "solo_host_probe_sec": sprobe,
            "verdict": verdict,
        }
        print(f"  {q}: local {lt:.2f}s  driver {dt:.2f}s  solo {st:.2f}s  -> {verdict}")

    print(json.dumps(verdicts, indent=2))
    if any(v.get("verdict") == "real_regression" for v in verdicts.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
