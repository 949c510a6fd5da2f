"""CLI job entrypoints — the drop-in replacements for the reference's
spark-submit scripts (a reference user switches by pointing spark-submit
here):

  reference                          this engine
  ---------------------------------  -------------------------------------
  sparkify_etl.py --bucket B         python -m event_data_etl_gcs_spark.jobs
    (full corpus, song+log)            full --song-data ... --log-data ...
                                       --output ...
  sparkify_etl_2.py --bucket B       python -m event_data_etl_gcs_spark.jobs
    --raw_file_name F                  incremental --raw-dir ... --output
    (log only, one file)               ... --checkpoint ...

Paths are any Hadoop-compatible URI (gs://, s3a://, file:/...) — the GCS
specificity of the reference is just a path prefix here. The incremental
job replaces per-file argument plumbing with the checkpointed streaming
source (processes whatever is new under --raw-dir; SURVEY.md §2.7).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="event_data_etl_gcs_spark.jobs")
    sub = parser.add_subparsers(dest="cmd", required=True)

    full = sub.add_parser("full", help="full-corpus batch: song + log -> star schema")
    full.add_argument("--song-data", required=False, default=None)
    full.add_argument("--log-data", required=True)
    full.add_argument("--output", required=True)
    full.add_argument("--no-partition", action="store_true",
                      help="unpartitioned outputs (reference variant 2 layout)")

    incr = sub.add_parser("incremental", help="drain new raw files -> users/time")
    incr.add_argument("--raw-dir", required=True)
    incr.add_argument("--output", required=True)
    incr.add_argument("--checkpoint", required=True)
    incr.add_argument("--watermark", default="1 hour")

    args = parser.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name=f"etl-{args.cmd}")
    try:
        if args.cmd == "full":
            from .plans.sparkify import run_pipeline

            res = run_pipeline(
                spark,
                song_data_path=args.song_data,
                log_data_path=args.log_data,
                output_dir=args.output,
                partitioned=not args.no_partition,
            )
            for name, path in res.paths.items():
                print(f"wrote {name} -> {path}")
        else:
            from .streaming.incremental import run_incremental_available_now

            run_incremental_available_now(
                spark,
                raw_dir=args.raw_dir,
                output_dir=args.output,
                checkpoint_dir=args.checkpoint,
                watermark=args.watermark,
            )
            print(f"drained {args.raw_dir} -> {args.output}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
