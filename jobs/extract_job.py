"""spark-submit entry point for the extraction pipeline.

    spark-submit --py-files engine.zip jobs/extract_job.py \
        --input  /path/to/documents   (parquet/iceberg spans table) \
        --output /path/to/extracted \
        --run-id run-2026-08-16 \
        [--num-partitions N] [--master local[32]]

Resumable: rerunning with the same output path anti-joins away already
extracted doc_ids (snapshot checkpoint, SURVEY.md §3.4); per-partition
lineage and run metrics land at {output}_lineage / {output}_metrics.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--boilerplate-fallback",
        action="store_true",
        help="pages without <main> fall back to the Arc90 boilerplate-"
        "strip winner instead of emitting empty markdown (off by "
        "default: the reference's no-main semantics are fixture-pinned)",
    )
    args = ap.parse_args()

    from helix_html2md_spark.plans.job import run_extract_job
    from helix_html2md_spark.session import build_session

    spark = build_session("extract-job", master=args.master)
    metrics = run_extract_job(
        spark,
        args.input,
        args.output,
        run_id=args.run_id,
        num_partitions=args.num_partitions,
        defaults=(
            {"boilerplate_fallback": True}
            if args.boilerplate_fallback
            else None
        ),
    )
    print(metrics)
    spark.stop()


if __name__ == "__main__":
    main()
