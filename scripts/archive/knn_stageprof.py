#!/usr/bin/env python3
"""One fresh-session run of knn_edges_ann defaults on the 100x Gaussian
corpus with event logging; prints per-stage wall + name afterwards."""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

LOGDIR = "/tmp/sparklogs_r6"


def main() -> None:
    os.makedirs(LOGDIR, exist_ok=True)
    for f in glob.glob(f"{LOGDIR}/*"):
        os.remove(f)
    from event_data_etl_gcs_spark.operators.graph import knn_edges_ann
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(
        app_name="knn_stageprof",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{LOGDIR}",
        },
    )
    gdf = spark.read.parquet("/tmp/spark_graft_scale_r6/gauss1000000.parquet")
    t0 = time.perf_counter()
    n = knn_edges_ann(gdf, k=3).count()
    wall = time.perf_counter() - t0
    print(f"TOTAL {wall:.2f}s edges={n}")
    spark.stop()

    stages = []
    for path in glob.glob(f"{LOGDIR}/*"):
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                    stages.append((dur, si["Stage ID"], si.get("Number of Tasks"), si["Stage Name"].split("\n")[0][:90]))
    stages.sort(reverse=True)
    print("top stages by wall:")
    for dur, sid, ntasks, name in stages[:15]:
        print(f"  {dur:7.2f}s  stage {sid:4d}  tasks={ntasks:4d}  {name}")
    print(f"sum of stage walls: {sum(s[0] for s in stages):.1f}s over {len(stages)} stages")


if __name__ == "__main__":
    main()
