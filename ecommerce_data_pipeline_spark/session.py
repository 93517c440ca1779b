"""SparkSession factory.

Mirrors the reference's session setup (analytics/spark/jobs/bronze_orders_raw.py:12-23)
minus its demo sizing: the reference pins ``spark.sql.shuffle.partitions=4`` and
1-core executors; at 100 TB that is exactly backwards. Here AQE owns shuffle
sizing (coalescing + skew-join splitting), the configured partition count is a
ceiling AQE coalesces down from, and broadcast joins stay enabled so dimension
joins (region/nation/part at any SF) never shuffle the fact side.

Scale notes (local[32] here, 1000-executor cluster in production):
- ``spark.sql.adaptive.enabled``: runtime re-planning — skew-join splitting and
  post-shuffle coalescing are the difference between a 2-minute and 2-hour
  stage at 100 TB.
- ``spark.sql.files.maxPartitionBytes`` stays at the 128m default: with ~100k
  parquet files of ~1 GB at 100 TB that yields ~800k scan tasks — fine; do NOT
  raise it so far that a task's columnar batches outgrow executor memory.
- Arrow is enabled for the (rare) Pandas-UDF paths; everything hot stays in
  whole-stage codegen.
- Session timezone is pinned UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.

Spark 4.1 decisions (audited round 5):
- ANSI mode stays ON (the 4.x default). A/B at sf0.1 showed ANSI-off is
  not faster (exact_dedup 0.27→0.34s, minhash_lsh_pairs 4.3→5.3s warm),
  and all 85 oracle rows hash-match under ANSI — the cents-exact money
  discipline never relies on silent-null casts.
- Timestamp read policy: parquet `timestamp[us]` columns are read as
  TIMESTAMP_NTZ (Spark 4 default) and kept NTZ — NTZ matches DuckDB's
  naive timestamps for oracle parity. All timestamp arithmetic goes
  through functions.epoch_micros/epoch_seconds (NTZ→LTZ reinterpretation
  under the pinned-UTC zone), never CAST(ts AS DOUBLE) / raw unix_micros,
  both of which Spark 4 rejects on NTZ.
- Shuffle/io codecs stay at defaults (lz4): zstd and compression-off both
  benched neutral-to-worse locally, and lz4 is the right cluster default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "ecommerce-data-pipeline-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    metastore_dir: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    In local mode ``cpus`` maps to ``local[N]`` threads; on a real cluster the
    master URL comes from spark-submit and this factory only contributes SQL
    conf. All settings are safe to apply to an existing session except
    driver memory (JVM-start-only), which is why it is passed via config
    before ``getOrCreate``.
    """
    n = cpus or default_parallelism()
    # Shuffle-partition ceiling: 2x cores locally; AQE coalesces downward.
    # On a big cluster this would be O(total-cores * 2..4) or left to AQE
    # with spark.sql.adaptive.coalescePartitions.initialPartitionNum.
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", str(max(2 * n, 32)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # Persistent catalog (reference: Hive Metastore shared by Spark and
    # Trino, spark-defaults.conf:18, trino delta.properties:2-3). With a
    # metastore dir — argument or $SPARK_GRAFT_METASTORE — databases and
    # tables registered via register_catalog survive session restarts: a
    # local Derby-backed HMS standing in for the thrift metastore a cluster
    # would point at (spark.hadoop.hive.metastore.uris). Off by default:
    # the correctness driver and tests use ephemeral in-memory catalogs.
    metastore_dir = metastore_dir or os.environ.get("SPARK_GRAFT_METASTORE")
    if metastore_dir:
        builder = (
            builder.config(
                "spark.sql.warehouse.dir", os.path.join(metastore_dir, "warehouse")
            )
            .config(
                "javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={os.path.join(metastore_dir, 'metastore_db')};create=true",
            )
            .enableHiveSupport()
        )
    # Delta Lake is the production table format (the reference already uses
    # io.delta extensions); wire it in when the package is present, otherwise
    # lake.py provides MERGE semantics over plain parquet.
    try:  # pragma: no cover - delta not bundled in this environment
        import delta  # noqa: F401

        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    except ImportError:
        pass
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
