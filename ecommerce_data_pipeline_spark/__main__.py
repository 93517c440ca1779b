"""spark-submit-able entrypoint: run the medallion pipeline as a job.

The reference ships its pipeline as five spark-submit scripts driven by
Airflow (analytics/airflow/dags/rt_pipeline.py schedules
bronze_*_raw.py / silver_*.py / silver_enrich.py plus a dbt shell-out);
this engine is a library, so the job surface is one module:

    python -m ecommerce_data_pipeline_spark --mode batch \
        --sf-dir /root/testdata/sf0.01 --lake /tmp/lake
    python -m ecommerce_data_pipeline_spark --mode streaming ...
    python -m ecommerce_data_pipeline_spark --mode query \
        --sf-dir /root/testdata/sf0.01 --name fct_sales_minute [--show 10]

batch     = bronze → silver (W1 dedup + parse MERGE) → enrich → gold
            (+ the dbt-parity quality suite; non-zero exit on failure).
streaming = the same chain as checkpointed availableNow micro-batches
            (stage fixture events as files, drain, leave the lake behind).
query     = run any registry query by name and print N rows.

On a real cluster, drop --master (spark-submit provides it) and point
--lake at the shared store; $SPARK_GRAFT_METASTORE makes the catalog
persistent (session.py).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ecommerce_data_pipeline_spark")
    ap.add_argument("--mode", choices=["batch", "streaming", "query"], required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--lake", default=None, help="lakehouse root (batch/streaming)")
    ap.add_argument("--name", default=None, help="registry query name (query mode)")
    ap.add_argument("--show", type=int, default=10)
    args = ap.parse_args(argv)

    from ecommerce_data_pipeline_spark.session import get_spark

    spark = get_spark("ecom-pipeline-job")
    spark.sparkContext.setLogLevel("WARN")

    if args.mode == "query":
        from ecommerce_data_pipeline_spark.queries import QUERIES

        if not args.name or args.name not in QUERIES:
            known = ", ".join(sorted(QUERIES)[:10])
            print(
                f"--name must be one of the {len(QUERIES)} registry queries "
                f"(e.g. {known}, ...)",
                file=sys.stderr,
            )
            return 2
        QUERIES[args.name](spark, args.sf_dir).show(args.show, truncate=False)
        return 0

    import tempfile

    from ecommerce_data_pipeline_spark import pipeline as pl
    from ecommerce_data_pipeline_spark.sources.events import (
        orders_events,
        payments_events,
    )

    lake_root = args.lake or tempfile.mkdtemp(prefix="ecom_lake_")
    lake = pl.Lakehouse(lake_root)
    if args.mode == "batch":
        pl.run_all(
            spark,
            lake,
            orders_events(spark, args.sf_dir),
            payments_events(spark, args.sf_dir),
        )
    else:
        from ecommerce_data_pipeline_spark.streaming import (
            run_streaming_pipeline,
            stage_event_files,
        )

        o_src = f"{lake_root}/_src/orders"
        p_src = f"{lake_root}/_src/payments"
        o_schema = stage_event_files(spark, orders_events(spark, args.sf_dir), o_src)
        p_schema = stage_event_files(
            spark, payments_events(spark, args.sf_dir), p_src
        )
        run_streaming_pipeline(
            spark, lake, o_src, p_src, o_schema, p_schema, f"{lake_root}/_ckpt"
        )
    n = lake.fct_sales_minute.read(spark).count()
    print(f"gold.fct_sales_minute: {n} minute buckets at {lake_root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
