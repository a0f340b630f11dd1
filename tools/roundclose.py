#!/usr/bin/env python3
"""Round-close bench routine (VERDICT r14 item 3) — NOT part of the library.

Usage: python3 tools/roundclose.py N [--sf=/root/testdata/sf0.1] [--skip-bench]

Runs the full graft.Bench at the given SF (unless --skip-bench and a fresh
bench_full.json exists), archives it as bench_full_r{N}_local.json, then
runs benchdiff vs round N-1 WITH --reprobe so every REGRESSED flag ships
adjudicated, and prints a summary carrying BOTH probe distributions
(calib + calib_scan), the raw total, and the calibration-normalized total —
the cross-round exchange-rate context that r14's archive lacked.
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def med(xs):
    return statistics.median(xs) if xs else None


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    rnd = int(sys.argv[1])
    sf = "/root/testdata/sf0.1"
    skip = False
    for a in sys.argv[2:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a == "--skip-bench":
            skip = True
    full = os.path.join(REPO, "bench_full.json")
    if not skip:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32")
        env.pop("SPARK_GRAFT_BENCH_ONLY", None)  # archives must be unfiltered
        print(f"# roundclose: full bench at {sf} (this takes ~10-15 min) ...")
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           env=env, cwd=REPO, capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            sys.exit(f"bench failed rc={r.returncode}:\n{r.stdout[-3000:]}")
    d = json.load(open(full))
    archive = os.path.join(REPO, f"bench_full_r{rnd}_local.json")
    json.dump(d, open(archive, "w"))
    print(f"# roundclose: archived {archive}")
    cal, scan = med(d.get("calib", [])), med(d.get("calib_scan", []))
    print(f"# probes: calib_med={cal} calib_scan_med={scan} "
          f"box_loaded={d.get('box_loaded')} errors={d.get('num_errors')} "
          f"contended={d.get('contended')}")
    prev = os.path.join(REPO, f"bench_full_r{rnd - 1}_local.json")
    if not os.path.exists(prev):
        prev = os.path.join(REPO, f"BENCH_r{rnd - 1:02d}.json")
    if os.path.exists(prev):
        pd_ = json.load(open(prev)) if prev.endswith("_local.json") else None
        cal_prev = med(pd_.get("calib", [])) if pd_ else None
        total_min = d.get("total_min") or 0.0
        if cal_prev and cal:
            norm = cal_prev / cal
            print(f"# raw total_min={total_min:.1f}s over "
                  f"{d.get('num_queries')} queries; normalized to r{rnd - 1}'s "
                  f"yardstick: {total_min * norm:.1f}s "
                  f"(calib ratio {norm:.3f})")
        else:
            # falling back to the driver's BENCH_r{N-1}.json (no calib list)
            # or a probe-less artifact: claiming "normalized" with norm=1.0
            # would misdescribe a raw number as a cross-round one
            print(f"# raw total_min={total_min:.1f}s over "
                  f"{d.get('num_queries')} queries; no prior calib — raw only")
        print(f"# roundclose: benchdiff vs {os.path.basename(prev)} "
              "with --reprobe ...")
        subprocess.run([sys.executable, os.path.join(REPO, "tools/benchdiff.py"),
                        prev, archive, f"--reprobe={sf}"], cwd=REPO)
    else:
        print(f"# roundclose: no prior-round artifact found for r{rnd - 1}")


if __name__ == "__main__":
    main()
