"""Scheduling-occupancy evidence for the index build (quota-independent).

The burn-bracket pair protocol needs the host quota to hold for minutes;
this report instead asks the question the pair is a proxy for: DOES THE
ENGINE KEEP N CORES FED? It runs the 842k-turn build at N cores, then
reads Spark's own task metrics (REST API of the live UI):

  occupancy  = sum(task executorRunTime) / (wall * cores)
      fraction of the wall-clock x cores area with a task RESIDENT on a
      core. Host-quota stalls inflate runTime and wall together, so
      occupancy stays a property of the ENGINE's parallel structure
      (scheduling gaps, shuffle barriers, serial driver work lower it;
      cycle starvation does not).
  cpu_frac   = sum(task executorCpuTime) / (wall * cores)
      actual cycles delivered — quota-dependent by construction; reported
      for contrast with occupancy.
  straggler  = per-stage max/median task duration for the heavy stages.

Usage: python scripts/utilization_report.py [cores] [n_convs] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_spark.config import AnalyzerConfig, IndexConfig  # noqa: E402
from elasticsearch_spark.fixtures.transcripts import generate_transcripts  # noqa: E402
from elasticsearch_spark.index import build_index  # noqa: E402
from elasticsearch_spark.session import get_spark  # noqa: E402

N_PARTITIONS = 64  # identical to the scaling-pair layout


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/utilization.json"

    os.environ["SPARK_GRAFT_UI"] = "true"  # REST task-metrics API
    spark = get_spark(cores=cores, shuffle_partitions=N_PARTITIONS,
                      app_name=f"util_{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    pdf = generate_transcripts(n_convs=n_convs, seed=42)
    turns = spark.createDataFrame(pdf).cache()
    n_turns = turns.count()

    idx_dir = f"/tmp/es_spark_util/idx_c{cores}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cfg = IndexConfig(
        stored_cols=("role", "tool", "ts"),
        analyzer=AnalyzerConfig(kind="standard"),
        n_partitions=N_PARTITIONS,
        dedup_latest_by="ts",
    )
    pre_stages = {s["stageId"] for s in _api(base, "/stages")}
    t0 = time.perf_counter()
    build_index(spark, turns, idx_dir, cfg)
    wall = time.perf_counter() - t0

    stages = [
        s for s in _api(base, "/stages?status=COMPLETE")
        if s["stageId"] not in pre_stages
    ]
    run_ms = sum(s.get("executorRunTime", 0) for s in stages)
    cpu_ns = sum(s.get("executorCpuTime", 0) for s in stages)
    occupancy = run_ms / 1000.0 / (wall * cores)
    cpu_frac = cpu_ns / 1e9 / (wall * cores)

    # straggler profile of the heavy stages (>= 5% of total task time)
    heavy = []
    for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0)):
        if s.get("executorRunTime", 0) < 0.05 * run_ms or s["numCompleteTasks"] < 2:
            continue
        try:
            q = _api(
                base,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            med, mx = q["executorRunTime"]
        except Exception:
            med = mx = None
        rec = {
            "stage": s["stageId"],
            "name": s.get("name", "")[:60],
            "tasks": s["numCompleteTasks"],
            "run_sec": round(s["executorRunTime"] / 1000.0, 1),
            "task_med_sec": None if med is None else round(med / 1000.0, 2),
            "task_max_sec": None if mx is None else round(mx / 1000.0, 2),
            "straggler_x": None if not med else round(mx / med, 2),
        }
        # per-task detail for the top straggler stage: is the slow task
        # BIG (data skew) or just SLOW (host stall / one-time overhead)?
        if not heavy:
            try:
                tl = _api(
                    base,
                    f"/stages/{s['stageId']}/{s['attemptId']}/taskList"
                    "?length=500&sortBy=-runtime",
                )
                rec["top_tasks"] = [
                    {
                        "idx": t["index"],
                        "run_sec": round(t["duration"] / 1000.0, 2),
                        "input_mb": round(
                            t.get("taskMetrics", {})
                            .get("inputMetrics", {})
                            .get("bytesRead", 0) / 1e6, 1),
                        "shuffle_read_mb": round(
                            t.get("taskMetrics", {})
                            .get("shuffleReadMetrics", {})
                            .get("localBytesRead", 0) / 1e6
                            + t.get("taskMetrics", {})
                            .get("shuffleReadMetrics", {})
                            .get("remoteBytesRead", 0) / 1e6, 1),
                        "records": t.get("taskMetrics", {})
                        .get("shuffleReadMetrics", {})
                        .get("recordsRead", 0),
                    }
                    for t in tl[:5]
                ]
            except Exception:
                pass
        heavy.append(rec)

    result = {
        "cores": cores,
        "n_turns": int(n_turns),
        "n_partitions": N_PARTITIONS,
        "build_sec": round(wall, 2),
        "build_turns_per_sec": round(n_turns / wall, 1),
        "n_stages": len(stages),
        "task_run_core_sec": round(run_ms / 1000.0, 1),
        "task_cpu_core_sec": round(cpu_ns / 1e9, 1),
        "occupancy": round(occupancy, 3),
        "cpu_frac": round(cpu_frac, 3),
        "heavy_stages": heavy[:6],
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()


