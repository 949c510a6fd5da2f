#!/usr/bin/env python3
"""Round-13 A/B (VERDICT r12 #5): raw vs fanned `documents` scan for the
map-only text rows + the two heavier headline rows that stack map work
below their first exchange. Monkeypatches the query module's load_table
binding per arm; interleaved arms, one session, checksums must match."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df) -> tuple:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("n"),
        *[
            F.max(F.xxhash64(df[c].cast("string"))).alias(f"h{i}")
            for i, c in enumerate(df.columns)
        ],
    ).collect()[0]
    return tuple(row)


def main() -> None:
    import event_data_etl_gcs_spark.plans.training_corpus as tc_plan
    import event_data_etl_gcs_spark.queries.corpus as qcorpus
    import event_data_etl_gcs_spark.queries.multimodal as qmm
    import event_data_etl_gcs_spark.queries.text as qtext
    from event_data_etl_gcs_spark.queries import all_queries
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_text_fanout_r13")
    sc = spark.sparkContext
    specs = all_queries()

    def fan_loader(s, d, name, fan_out=False):
        return load_table(s, d, name, fan_out=True)

    mods = [qtext, qcorpus, qmm]

    def set_fan(on: bool):
        for m in mods:
            m.load_table = fan_loader if on else load_table

    targets = [
        "token_count",
        "text_quality",
        "term_frequencies",
        "training_corpus_select",
        "multimodal_decode",
    ]
    for qname in targets:
        spec = specs[qname]
        times: dict[str, list[float]] = {"raw": [], "fan": []}
        chks = set()
        for arm in ("raw", "fan", "raw", "fan", "raw", "fan"):
            set_fan(arm == "fan")
            sc.setJobDescription(f"{qname} [{arm}]")
            t0 = time.perf_counter()
            chk = checksum(spec.fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            chks.add(chk)
        set_fan(False)
        print(
            f"{qname}: raw={[round(x,3) for x in times['raw']]} "
            f"fan={[round(x,3) for x in times['fan']]} "
            f"identical={len(chks) == 1}",
            flush=True,
        )
    sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
