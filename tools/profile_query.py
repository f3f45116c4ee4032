"""Per-query profiler (optimization round): run one headline query in a
fresh bench-config session and dump, from the session's AppStatusStore /
SQLAppStatusStore (no UI needed):

  - every Spark JOB the query ran (duration, description, stage ids)
  - every STAGE (tasks, executor run time, shuffle read/write bytes,
    input bytes, spill)
  - every SQL execution's FINAL physical plan (post-AQE), which for
    eager-materializing ETs is the only place the real executed plans
    are visible — the returned DataFrame's own explain() is just the
    scan of the materialized result
  - the returned DataFrame's explain("formatted") for the lazy tail

Usage:
  python tools/profile_query.py NAME [--out FILE] [--samples N]

The dump answers guide-§1 questions directly: how many jobs, where the
wall-clock goes, how many Exchanges, which joins, whether Python nodes
appear.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def scala_seq_to_list(seq):
    out = []
    it = seq.iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def profile(name: str, samples: int, out_path: str | None) -> None:
    import bench
    import __spark_entry__ as entrymod

    spark = bench.make_session()
    bench.warmup(spark, entrymod)
    qs = entrymod.base_queries()
    fn = qs[name]

    jsc = spark.sparkContext._jsc.sc()
    store = jsc.statusStore()
    sql_store = spark._jsparkSession.sharedState().statusStore()

    if "--prewarm" in sys.argv:
        # one untimed run first: e.g. lake_day_ingest memoizes its
        # day-0/day-1 state build on first invocation per process
        fn(spark, bench.SF_DIR).write.mode("overwrite") \
            .format("noop").save()

    # ---- timed runs (same shape as bench.time_query) ----
    times = []
    marks = []  # (t0, t1) of each sample
    for _ in range(samples):
        bench.settle(spark, gap=0.1)
        t0 = time.time()
        df = fn(spark, bench.SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        t1 = time.time()
        times.append(t1 - t0)
        marks.append((t0, t1))
    best_i = min(range(len(times)), key=lambda i: times[i])
    t0, t1 = marks[best_i]

    lines = []
    w = lines.append
    w(f"== profile {name} ==")
    w(f"samples: {[round(t, 3) for t in times]}  best={times[best_i]:.3f}s"
      f" (sample {best_i})")

    # ---- jobs within the best sample's window ----
    jobs = scala_seq_to_list(store.jobsList(None))
    rows = []
    for j in jobs:
        sub = j.submissionTime()
        if not sub.isDefined():
            continue
        sub_ms = sub.get().getTime() / 1000.0
        if not (t0 - 0.05 <= sub_ms <= t1 + 0.05):
            continue
        comp = j.completionTime()
        dur = (comp.get().getTime() / 1000.0 - sub_ms
               if comp.isDefined() else -1.0)
        desc = j.description()
        rows.append((sub_ms, j.jobId(), dur,
                     desc.get() if desc.isDefined() else j.name()))
    rows.sort()
    w(f"\n-- {len(rows)} jobs in best sample window ({t1 - t0:.3f}s) --")
    for sub_ms, jid, dur, desc in rows:
        w(f"  job {jid:4d}  +{sub_ms - t0:7.3f}s  {dur:7.3f}s  "
          f"{desc[:140]}")

    # ---- stages within the window ----
    # Spark 4.1 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus)
    jvm = spark.sparkContext._jvm
    stages = scala_seq_to_list(store.stageList(
        None, False, False,
        spark.sparkContext._gateway.new_array(jvm.double, 0), None))
    srows = []
    for s in stages:
        sub = s.submissionTime()
        if not sub.isDefined():
            continue
        sub_ms = sub.get().getTime() / 1000.0
        if not (t0 - 0.05 <= sub_ms <= t1 + 0.05):
            continue
        comp = s.completionTime()
        dur = (comp.get().getTime() / 1000.0 - sub_ms
               if comp.isDefined() else -1.0)
        srows.append((sub_ms, s.stageId(), dur, s.numTasks(),
                      s.executorRunTime(), s.inputBytes(),
                      s.shuffleReadBytes(), s.shuffleWriteBytes(),
                      s.memoryBytesSpilled(), s.name()))
    srows.sort()
    w(f"\n-- {len(srows)} stages in window "
      f"(dur s | tasks | execRun ms | in MB | shRead MB | shWrite MB | "
      f"spill MB) --")
    for (sub_ms, sid, dur, ntask, run_ms, inb, srb, swb, sp,
         sname) in srows:
        w(f"  stage {sid:4d} +{sub_ms - t0:7.3f}s {dur:7.3f}s "
          f"t={ntask:3d} run={run_ms:7d} in={inb / 1e6:8.1f} "
          f"sr={srb / 1e6:7.1f} sw={swb / 1e6:7.1f} sp={sp / 1e6:5.1f} "
          f" {sname[:90]}")

    # ---- SQL executions + final plans in the window ----
    execs = scala_seq_to_list(sql_store.executionsList())
    w("\n-- SQL executions in window (post-AQE plans) --")
    for ex in execs:
        sub_ms = ex.submissionTime() / 1000.0
        if not (t0 - 0.05 <= sub_ms <= t1 + 0.05):
            continue
        comp = ex.completionTime()
        dur = (comp.get().getTime() / 1000.0 - sub_ms
               if comp.isDefined() else -1.0)
        w(f"\n=== SQL exec {ex.executionId()}  +{sub_ms - t0:.3f}s  "
          f"{dur:.3f}s  {ex.description()[:120]}")
        w(ex.physicalPlanDescription())

    # ---- the returned DataFrame's own formatted plan ----
    df = fn(spark, bench.SF_DIR)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    w("\n-- returned DataFrame explain(formatted) --")
    w(je.explainString(mode))

    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
        print(f"wrote {out_path} ({len(rows)} jobs, best "
              f"{times[best_i]:.3f}s)")
    else:
        print(text)
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(1)
    name = args[0]
    out = None
    samples = 2
    if "--out" in args:
        out = args[args.index("--out") + 1]
    if "--samples" in args:
        samples = int(args[args.index("--samples") + 1])
    profile(name, samples, out)


if __name__ == "__main__":
    main()
