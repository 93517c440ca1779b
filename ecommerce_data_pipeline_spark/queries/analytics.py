"""Analytical depth: scan-heavy rollups and distribution statistics
(exact and sketch-based)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.functions import (
    epoch_micros,
    money_sum,
    money_sum_sql,
)
from ecommerce_data_pipeline_spark.operators import curate as cu
from ecommerce_data_pipeline_spark.operators import dedup as dd
from ecommerce_data_pipeline_spark.operators import similarity as sim
from ecommerce_data_pipeline_spark.operators import text as tx
from ecommerce_data_pipeline_spark.operators import windows as win
from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup
from ecommerce_data_pipeline_spark.operators.enrich import enrich_orders
from ecommerce_data_pipeline_spark.operators.fact import sales_minute_agg
from ecommerce_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media_features,
)
from ecommerce_data_pipeline_spark.operators.parse import (
    bronze_projection,
    parse_orders,
    parse_payments,
)
from ecommerce_data_pipeline_spark.operators.service import (
    cart_totals,
    inventory_counters,
)
from ecommerce_data_pipeline_spark.sources.events import orders_events, payments_events
from ecommerce_data_pipeline_spark.sources.parquet import load_table, register_views

from ecommerce_data_pipeline_spark.queries._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    register,
)


# ---------------------------------------------------------------------------
# Analytical depth: scan-heavy rollups and distribution statistics
# ---------------------------------------------------------------------------


@register(
    "lineitem_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0
    AS sum_disc_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT))/1000000.0
    AS sum_charge,
  round(sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 / count(*), 4) AS avg_qty,
  round(sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 / count(*), 4)
    AS avg_price,
  round(sum(CAST(round(l_discount*100) AS BIGINT))/100.0 / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan-heavy rollup.
    One pass over the fact table, filter pushed to the parquet scan, all
    aggregation map-side partial then a 4-group shuffle — the plan is
    scan-bound at any scale. Money math in exact integer sub-units
    (cents / 1e-4 / 1e-6) so the double sums are order-independent and
    bit-stable; at >sf1000 swap the 1e-6-unit int64 sums for
    DecimalType(38,6) (overflow headroom)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    disc_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    charge_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 1000000
    ).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            (F.sum(disc_u) / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_u) / 1000000.0).alias("sum_charge"),
            F.round((F.sum(cents("l_quantity")) / 100.0) / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round((F.sum(cents("l_extendedprice")) / 100.0) / F.count(F.lit(1)), 4).alias("avg_price"),
            F.round((F.sum(cents("l_discount")) / 100.0) / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "events_value_quantiles",
    oracle="""
SELECT event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.9), 4) AS p90,
  round(quantile_cont(value, 0.99), 4) AS p99,
  count(*) AS n
FROM events GROUP BY event_type
""",
)
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group value quantiles (linear interpolation — identical
    semantics to DuckDB quantile_cont). Exact percentile sorts each group;
    at 100 TB use the approx_percentile twin below (t-digest-style sketch,
    mergeable map-side, no per-group sort)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# Quantile-band half-width for the approx-vs-exact check below. Must cover
# the sketch's rank-error guarantee (eps = 1/accuracy = 1e-4) PLUS one
# discrete-rank gap at the smallest fixture group (~2k rows/group at
# sf0.001 → 1 rank ≈ 5e-4 quantile): 5e-3 covers both with margin while
# staying a tight, meaningful band. p99 + 0.005 < 1.0.
_Q_BAND = 0.005


@register(
    "events_value_quantiles_approx",
    oracle=f"""
SELECT event_type,
  round(quantile_cont(value, 0.5 - {_Q_BAND}), 4) AS p50_lo,
  round(quantile_cont(value, 0.5 + {_Q_BAND}), 4) AS p50_hi,
  TRUE AS p50_ok,
  round(quantile_cont(value, 0.9 - {_Q_BAND}), 4) AS p90_lo,
  round(quantile_cont(value, 0.9 + {_Q_BAND}), 4) AS p90_hi,
  TRUE AS p90_ok,
  round(quantile_cont(value, 0.99 - {_Q_BAND}), 4) AS p99_lo,
  round(quantile_cont(value, 0.99 + {_Q_BAND}), 4) AS p99_hi,
  TRUE AS p99_ok,
  count(*) AS n
FROM events GROUP BY event_type
""",
)
def q_events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB formulation of events_value_quantiles: approx_percentile
    (mergeable quantile sketch, map-side combine, no sort). The sketch
    estimate itself is engine-specific, so the DETERMINISTIC contract is
    emitted instead: the exact quantile band [p-band, p+band] each
    estimate must land in (band covers the sketch's eps rank guarantee —
    see _Q_BAND) plus a boolean that it does. The oracle recomputes the
    exact bands and expects every check TRUE — a driver-hashable proof of
    the sketch's accuracy contract, per-group, any merge order."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("a90"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("a99"),
        *[
            F.round(F.percentile("value", p + s * _Q_BAND), 4).alias(
                f"p{int(p * 100)}_{'hi' if s > 0 else 'lo'}"
            )
            for p in (0.5, 0.9, 0.99)
            for s in (-1, 1)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    cols = ["event_type"]
    for p in (50, 90, 99):
        cols += [
            f"p{p}_lo",
            f"p{p}_hi",
            (
                (F.col(f"a{p}") >= F.col(f"p{p}_lo"))
                & (F.col(f"a{p}") <= F.col(f"p{p}_hi"))
            ).alias(f"p{p}_ok"),
        ]
    return agg.select(*cols, "n")


@register(
    "approx_distinct_users",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS exact_users,
  count(*) AS n_events, TRUE AS within_bound
FROM events GROUP BY event_type
""",
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user counts per event_type: hll_sketch_agg
    builds mergeable binary sketches map-side (fixed bytes per group —
    the shuffle is independent of cardinality), hll_sketch_estimate reads
    them out. The estimate is engine-specific, so the deterministic
    contract is emitted instead: the exact count (oracle-checkable) and a
    boolean that the estimate is within 5% of it (lgK=14 → rsd 0.81%, so
    5% is a 6-sigma bound; HLL register-max merge is order-independent,
    making the boolean stable under any partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias(
                "_est"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_bound"),
        )
    )




# ---------------------------------------------------------------------------
# Behavioral analytics: funnels, cohort retention, anomaly detection
# ---------------------------------------------------------------------------

from ecommerce_data_pipeline_spark.operators import behavior as bh  # noqa: E402


@register(
    "event_funnel",
    oracle="""
WITH s1 AS (SELECT user_id, min(ts) AS anchor_ts FROM events
            WHERE event_type='view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS anchor_ts FROM events e
       JOIN s1 USING(user_id)
       WHERE e.event_type='click' AND e.ts > s1.anchor_ts GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS anchor_ts FROM events e
       JOIN s2 USING(user_id)
       WHERE e.event_type='purchase' AND e.ts > s2.anchor_ts GROUP BY 1),
c AS (
  SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM s3))
SELECT step, event_type, users,
       round(users / greatest((SELECT count(*) FROM s1), 1), 4) AS pct_of_first
FROM c
""",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential view→click→purchase funnel (first-touch anchors).
    The reference's dashboards stop at the minute fact (README.md:154-190);
    this is the next query its users write. Fully lazy: per-step anchor
    cascades co-partitioned on user_id, single-row per-step aggregates
    unioned, denominator via 1-row broadcast — one job, no driver counts."""
    ev = load_table(spark, sf_dir, "events")
    return bh.funnel_steps(ev, ["view", "click", "purchase"])


@register(
    "retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, active_week)/7 AS INT) AS week_offset,
       count(*) AS users
FROM active JOIN firsts USING(user_id)
GROUP BY 1, 2
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (cohort_week × week_offset → users).
    Monday-truncated weeks match DuckDB's date_trunc('week') exactly; all
    stages shuffle on user_id (first-event groupBy, user×week distinct,
    co-partitioned join), final rollup is over the already-reduced frame."""
    ev = load_table(spark, sf_dir, "events")
    return bh.retention_matrix(ev)


@register(
    "minute_anomalies",
    oracle="""
WITH pm AS (
  SELECT date_trunc('minute', ts) AS minute_bucket,
         sum(CAST(round(value*100) AS BIGINT))/100.0 AS minute_value
  FROM events WHERE event_type='purchase' GROUP BY 1),
sc AS (
  SELECT minute_bucket, minute_value,
         avg(minute_value) OVER w AS m,
         stddev_samp(minute_value) OVER w AS sd,
         count(*) OVER w AS n
  FROM pm
  WINDOW w AS (ORDER BY minute_bucket ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING))
SELECT minute_bucket, minute_value,
       CASE WHEN n >= 30 AND sd > 0
            THEN round((minute_value - m)/sd, 4) END AS z,
       coalesce(abs(CASE WHEN n >= 30 AND sd > 0
                         THEN round((minute_value - m)/sd, 4) END) > 2.5,
                FALSE) AS is_anomaly
FROM sc
""",
)
def q_minute_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on per-minute purchase value.
    The data-sized stage is one map-side-partial minute groupBy (cents-exact
    sum); the trailing-60-minute window then runs over the aggregated
    series (~0.5M rows/year regardless of raw scale), where a global
    ORDER BY window is cheap by construction. z rounded to 4 dp so both
    engines' stddev accumulations hash identically."""
    ev = load_table(spark, sf_dir, "events")
    return bh.minute_value_anomalies(ev)


@register(
    "order_count_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1) t
GROUP BY 1
""",
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram via left join +
    two-level aggregation. The join and first groupBy share the custkey
    hash partitioning (one effective shuffle of each side); the second
    groupBy reduces a one-row-per-customer frame to O(distinct counts)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "conversion_lag",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
           WHERE event_type='view' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN v USING(user_id)
      WHERE e.event_type='purchase' AND e.ts > v.first_view GROUP BY 1)
SELECT CAST(date_diff('day', CAST(v.first_view AS DATE),
                      CAST(p.first_purchase AS DATE)) AS INT) AS lag_days,
       count(*) AS users
FROM v JOIN p USING(user_id)
GROUP BY 1
""",
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: calendar days between a user's first
    view and their first subsequent purchase, histogrammed. Both firsts
    are user_id-keyed groupBys over type-filtered slices; the join is
    co-partitioned; the final histogram groups a one-row-per-converter
    frame into O(distinct lags) rows."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(p, "user_id")
        .select(
            F.datediff(
                F.col("first_purchase").cast("date"),
                F.col("first_view").cast("date"),
            )
            .cast("int")
            .alias("lag_days")
        )
        .groupBy("lag_days")
        .agg(F.count(F.lit(1)).alias("users"))
    )


@register(
    "copurchase_lift",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
supp AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT part_a, part_b, n_both,
       round(n_both * CAST(n.n_orders AS DOUBLE)
             / (sa.n * CAST(sb.n AS DOUBLE)), 6) AS lift
FROM pairs
JOIN supp sa ON sa.l_partkey = part_a
JOIN supp sb ON sb.l_partkey = part_b
CROSS JOIN n
WHERE n_both >= 3
ORDER BY lift DESC, part_a, part_b
LIMIT 100
""",
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: top part pairs by lift
    (P(a,b)/P(a)P(b) over orders), min support 3 orders.

    The pair build is the per-order self-join (bounded by order width,
    not catalog size); supports join back via broadcast (the per-part
    support frame is one row per part). Lift arithmetic is one double
    multiply/divide per surviving pair — exact integer counts in,
    6-dp round out, so the hash is stable. At 100 TB the standard
    refinement is frequent-itemset pruning (drop parts below min
    support BEFORE pairing); the shape here already never materializes
    the full part×part space."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = F.broadcast(
        li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    supp = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sa = F.broadcast(supp.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na")))
    sb = F.broadcast(supp.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb")))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(n_orders)
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both")
                * F.col("n_orders").cast("double")
                / (F.col("na") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(100)
    )


@register(
    "user_trailing_hour_value",
    oracle="""
SELECT event_id, user_id,
       sum(CAST(round(value*100) AS BIGINT))
         OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) // 1000000
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
       / 100.0 AS trailing_1h_value
FROM events
""",
)
def q_user_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour spend: a RANGE window frame over integer
    epoch seconds (time-interval frames are the frame spec the rest of
    the registry's ROWS-frame windows don't cover). Both engines order by
    the same truncated epoch-second key so frame membership is identical
    despite sub-second timestamps; the frame sum is cents-exact. One
    shuffle on user_id; frame evaluation is a per-partition sliding
    accumulator inside codegen."""
    from pyspark.sql.window import Window as W

    from ecommerce_data_pipeline_spark.functions import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    es = F.floor(epoch_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(es)
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0
        ).alias("trailing_1h_value"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
WITH base AS (
  SELECT o_custkey AS c_custkey,
    max(o_orderdate) AS last_order,
    count(*) AS frequency,
    sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS monetary
  FROM orders GROUP BY 1),
scored AS (
  SELECT c_custkey, last_order, frequency, monetary,
    ntile(4) OVER (ORDER BY last_order DESC, c_custkey) AS r,
    ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f,
    ntile(4) OVER (ORDER BY monetary DESC, c_custkey) AS m
  FROM base)
SELECT r, f, m, concat(CAST(r AS VARCHAR), CAST(f AS VARCHAR),
                       CAST(m AS VARCHAR)) AS segment,
  count(*) AS customers,
  sum(CAST(round(monetary*100) AS BIGINT))/100.0 AS segment_revenue
FROM scored GROUP BY 1, 2, 3, 4
""",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles (NTILE with
    full tiebreaks so both engines bucket identically) rolled up to
    segment sizes and revenue — the classic CRM cut. The per-customer
    base is one groupBy; the three NTILEs are global windows over the
    customer-grain frame (N_customers rows — small post-aggregation; at
    extreme scale swap for approx-quantile bucket joins)."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        (F.sum(cents) / 100.0).alias("monetary"),
    )
    scored = base.select(
        "c_custkey",
        "monetary",
        F.ntile(4)
        .over(W.orderBy(F.col("last_order").desc(), F.col("c_custkey")))
        .alias("r"),
        F.ntile(4)
        .over(W.orderBy(F.col("frequency").desc(), F.col("c_custkey")))
        .alias("f"),
        F.ntile(4)
        .over(W.orderBy(F.col("monetary").desc(), F.col("c_custkey")))
        .alias("m"),
    )
    m_cents = F.round(F.col("monetary") * 100).cast("long")
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("customers"),
        (F.sum(m_cents) / 100.0).alias("segment_revenue"),
    ).select(
        "r", "f", "m",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ).alias("segment"),
        "customers",
        "segment_revenue",
    )


@register(
    "winsorized_event_stats",
    oracle="""
WITH bounds AS (
  SELECT event_type,
    round(quantile_cont(value, 0.01), 4) AS lo,
    round(quantile_cont(value, 0.99), 4) AS hi
  FROM events GROUP BY 1),
clamped AS (
  SELECT e.event_type, least(greatest(e.value, b.lo), b.hi) AS w,
    CAST(e.value < b.lo OR e.value > b.hi AS INTEGER) AS clipped
  FROM events e JOIN bounds b USING (event_type))
SELECT c.event_type, b.lo AS p01, b.hi AS p99,
  round(sum(CAST(round(w*100) AS BIGINT))/100.0 / count(*), 4)
    AS winsorized_mean,
  CAST(sum(clipped) AS BIGINT) AS n_clipped,
  count(*) AS n
FROM clamped c JOIN bounds b USING (event_type)
GROUP BY 1, 2, 3
""",
)
def q_winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics: clamp each event's value to its
    type's [p01, p99] band (bounds rounded to 4 dp so both engines clamp
    against identical thresholds) and report the outlier-resistant mean
    plus clip counts — the standard tail-taming step before training on
    heavy-tailed metrics. Bounds are a per-group exact percentile (swap
    for approx_percentile at 100 TB); the clamp join broadcasts the
    one-row-per-type bounds frame; the mean is cents-exact."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.01), 4).alias("lo"),
        F.round(F.percentile("value", 0.99), 4).alias("hi"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    clamped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.col("lo"),
        F.col("hi"),
        w.alias("w"),
        (
            (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
        )
        .cast("int")
        .alias("clipped"),
    )
    return clamped.groupBy(
        "event_type", F.col("lo").alias("p01"), F.col("hi").alias("p99")
    ).agg(
        F.round(
            (F.sum(F.round(F.col("w") * 100).cast("long")) / 100.0)
            / F.count(F.lit(1)),
            4,
        ).alias("winsorized_mean"),
        F.sum("clipped").cast("long").alias("n_clipped"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "event_path_trigrams",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    lag(event_type, 1) OVER w AS p1,
    lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT concat_ws('>', p2, p1, event_type) AS path, count(*) AS n
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20
""",
)
def q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey mining: the 20 most common 3-event paths across all users.
    One user_id shuffle; both lags share a single sort; the trigram
    rollup reduces map-side before the tiny final top-k."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@register(
    "event_transition_gaps",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
    lag(event_type) OVER w AS prev_type,
    lag(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT prev_type, event_type AS next_type,
  count(*) AS n_transitions,
  round(sum(date_diff('second', prev_ts, ts)) * 1.0 / count(*), 2)
    AS avg_gap_seconds
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
)
def q_event_transition_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition matrix with dwell times: per (prev, next)
    event-type pair, how often and how long users take between them.
    Gap arithmetic in whole integer seconds (truncated epoch diff — both
    engines identical), summed exactly before one rounded division."""
    from pyspark.sql.window import Window as W

    from ecommerce_data_pipeline_spark.functions import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.floor(epoch_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    seq = ev.select(
        F.col("event_type"),
        es.alias("es"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(es).over(w).alias("prev_es"),
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(
            F.sum(F.col("es") - F.col("prev_es")) / F.count(F.lit(1)), 2
        ).alias("avg_gap_seconds"),
    )


@register(
    "value_drift_psi",
    # Distribution-drift monitoring (Population Stability Index), the
    # data-quality gate a training pipeline runs before accepting a new
    # crawl/window: per event type, PSI between the chronologically first
    # and second half of the stream over 10 fixed value buckets
    # (width 25, capped). Laplace +1 smoothing keeps every bucket's
    # probability nonzero, so the full 10-bucket grid (including
    # zero-count buckets) enters the sum on both engines; all
    # probabilities derive from integer counts, one rounded sum at the
    # end. PSI >= 0.2 is the conventional "investigate" threshold.
    oracle="""
WITH e AS (
  SELECT event_type, value,
         date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS es
  FROM events
),
a AS (SELECT (min(es) + max(es)) // 2 AS mid FROM e),
c AS (
  SELECT event_type, least(9, CAST(floor(value / 25) AS INTEGER)) AS bucket,
    sum(CASE WHEN es < mid THEN 1 ELSE 0 END) AS c_ref,
    sum(CASE WHEN es >= mid THEN 1 ELSE 0 END) AS c_cur
  FROM e CROSS JOIN a GROUP BY 1, 2
),
g AS (
  SELECT t.event_type, b.bucket,
         coalesce(c.c_ref, 0) AS c_ref, coalesce(c.c_cur, 0) AS c_cur
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) b
  LEFT JOIN c ON c.event_type = t.event_type AND c.bucket = b.bucket
),
n AS (
  SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
         CAST(sum(c_cur) AS BIGINT) AS n_cur
  FROM g GROUP BY 1
)
SELECT g.event_type, n.n_ref, n.n_cur,
  round(sum(((c_ref + 1.0) / (n_ref + 10) - (c_cur + 1.0) / (n_cur + 10))
            * ln(((c_ref + 1.0) / (n_ref + 10))
                 / ((c_cur + 1.0) / (n_cur + 10)))), 4) AS psi
FROM g JOIN n ON n.event_type = g.event_type
GROUP BY 1, 2, 3
""",
)
def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type PSI between the first and second chronological half
    of the stream: one 1-row time-anchor broadcast, one (type, bucket)
    groupBy with both halves' counts as conditional sums (no second scan),
    the fixed 10-bucket grid joined in so zero-count buckets still
    contribute their smoothed mass, one final per-type sum."""
    from ecommerce_data_pipeline_spark.functions import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    es = epoch_micros(F.col("ts"))
    e = ev.select("event_type", "value", es.alias("es"))
    anchor = e.agg(
        F.floor((F.min("es") + F.max("es")) / F.lit(2)).cast("long").alias("mid")
    )
    c = (
        e.crossJoin(F.broadcast(anchor))
        .groupBy(
            "event_type",
            F.least(F.lit(9), F.floor(F.col("value") / 25).cast("int")).alias(
                "bucket"
            ),
        )
        .agg(
            F.sum(F.when(F.col("es") < F.col("mid"), 1).otherwise(0)).alias(
                "c_ref"
            ),
            F.sum(F.when(F.col("es") >= F.col("mid"), 1).otherwise(0)).alias(
                "c_cur"
            ),
        )
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(10).select(F.col("id").cast("int").alias("bucket"))
            )
        )
    )
    g = (
        grid.join(c, ["event_type", "bucket"], "left")
        .fillna(0, subset=["c_ref", "c_cur"])
    )
    n = g.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p = (F.col("c_ref") + 1.0) / (F.col("n_ref") + 10)
    q = (F.col("c_cur") + 1.0) / (F.col("n_cur") + 10)
    return (
        g.join(F.broadcast(n), "event_type")
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi"))
    )


@register(
    "user_decayed_value",
    # Exponential time-decay LTV: weight = exp(-(now - ts)/tau), tau = 7
    # days, "now" = the corpus max event second (deterministic anchor).
    # Epoch math in whole seconds on both engines. Each decayed term is
    # rounded to integer 1e-4 units PER ROW and summed as BIGINT, so the
    # group sum is exact and independent of partition/summation order on
    # both engines; the only residual cross-engine risk is a per-row exp()
    # ulp landing exactly on a .5 rounding boundary (~1e-14 relative).
    oracle="""
WITH p AS (
  SELECT user_id, value, date_diff('second', TIMESTAMP '1970-01-01', ts) AS es
  FROM events WHERE event_type = 'purchase'
),
now_s AS (SELECT max(es) AS now_es FROM p)
SELECT user_id,
  count(*) AS n_purchases,
  CAST(sum(CAST(round(value * exp(-(now_es - es) / 604800.0) * 10000)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS decayed_value
FROM p CROSS JOIN now_s
GROUP BY user_id
""",
)
def q_user_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decayed lifetime value per user (recency-weighted
    LTV, the retention-marketing twin of plain RFM): purchase values decay
    with a 7-day time constant against the corpus max event time. One
    filter + one 1-row broadcast anchor + one groupBy. Terms are rounded
    to integer 1e-4 units per row and summed as longs, making the group
    sum exact and summation-order-independent (see oracle comment)."""
    from ecommerce_data_pipeline_spark.functions import epoch_micros

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    es = F.floor(epoch_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    p = ev.select("user_id", "value", es.alias("es"))
    now_s = p.agg(F.max("es").alias("now_es"))
    term = F.round(
        F.col("value")
        * F.exp(-(F.col("now_es") - F.col("es")) / F.lit(604800.0))
        * F.lit(10000.0)
    ).cast("long")
    return (
        p.crossJoin(F.broadcast(now_s))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum(term).cast("double") / F.lit(10000.0)).alias(
                "decayed_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Behavioral: U-shaped multi-touch attribution
# ---------------------------------------------------------------------------


@register(
    "multitouch_attribution",
    # Position-based (U-shaped) credit: 40/20/40 across first/middles/last
    # view in the 24-hour pre-purchase window. Credits are integer cents via
    # exact rationals — round(cents*2/5.0) has fractional parts in
    # {0,.4,.8} (even numerator) so rounding-mode ties can never trigger;
    # the middle split's single divide+round is IEEE-identical per row and
    # the per-user sums are integer (order-independent).
    oracle="""
WITH p AS (SELECT user_id, event_id AS pid, ts AS pts,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, event_id AS vid, ts AS vts
      FROM events WHERE event_type = 'view'),
j AS (SELECT p.user_id, pid, cents, vid, vts
      FROM p JOIN v ON v.user_id = p.user_id
       AND v.vts < p.pts AND v.vts >= p.pts - INTERVAL 24 HOUR),
t AS (SELECT *, count(*) OVER (PARTITION BY pid) AS n,
             row_number() OVER (PARTITION BY pid ORDER BY vts, vid) AS rn
      FROM j),
c AS (SELECT user_id, pid,
        CASE WHEN n = 1 THEN 'single' WHEN rn = 1 THEN 'first'
             WHEN rn = n THEN 'last' ELSE 'middle' END AS pos,
        CASE WHEN n = 1 THEN cents
             WHEN rn = 1 OR rn = n THEN CAST(round(cents * 2 / 5.0) AS BIGINT)
             ELSE CAST(round(cents / (5.0 * (n - 2))) AS BIGINT) END AS credit
      FROM t)
SELECT user_id,
       CAST(count(DISTINCT pid) AS BIGINT) AS attributed_purchases,
       count(*) AS touches,
       CAST(sum(CASE WHEN pos = 'single' THEN credit ELSE 0 END) AS BIGINT)
         AS single_cents,
       CAST(sum(CASE WHEN pos = 'first' THEN credit ELSE 0 END) AS BIGINT)
         AS first_cents,
       CAST(sum(CASE WHEN pos = 'middle' THEN credit ELSE 0 END) AS BIGINT)
         AS middle_cents,
       CAST(sum(CASE WHEN pos = 'last' THEN credit ELSE 0 END) AS BIGINT)
         AS last_cents,
       CAST(sum(credit) AS BIGINT) AS total_cents
FROM c GROUP BY 1
""",
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: each purchase's value is split
    40% first / 40% last / 20% across middle views in the 24 hours
    before it (the reference's notification-cache TTL horizon). The
    purchase-view pairing is a BUCKETED range join: both sides carry a
    24 h-aligned day bucket (purchases one, views exploded to the <= 2
    buckets a match can land in, since a view only attaches to purchases
    in (vts, vts+24h]), the join is a plain equi-join on
    (user_id, bucket), and the exact time predicate runs as a residual
    AFTER the equi-match. A hot user's history therefore never meets
    itself whole — each joined partition holds one user-day, the same
    single-shuffle discipline as operators/asof.py — and each (purchase,
    view) pair survives in exactly one bucket because bucket(pts) equals
    only one of the view's two exploded values. Per-purchase windows are
    purchase-keyed, per-user sums are integer cents."""
    day_us = 86_400_000_000  # 24 h in microseconds, bucket width = window
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.floor(epoch_micros(F.col("ts")) / day_us).alias("bkt"),
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("vuser"),
            F.col("event_id").alias("vid"),
            F.col("ts").alias("vts"),
            F.floor(epoch_micros(F.col("ts")) / day_us).alias("vbkt"),
        )
        .withColumn("bkt", F.explode(F.array(F.col("vbkt"), F.col("vbkt") + 1)))
        .drop("vbkt")
    )
    j = p.join(
        v,
        (F.col("vuser") == F.col("user_id"))
        & (v["bkt"] == p["bkt"])
        & (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.timestamp_add("HOUR", F.lit(-24), F.col("pts"))),
    ).drop("bkt")
    wp = Window.partitionBy("pid")
    wo = Window.partitionBy("pid").orderBy("vts", "vid")
    t = j.withColumn("n", F.count("*").over(wp)).withColumn(
        "rn", F.row_number().over(wo)
    )
    n, rn, cents = F.col("n"), F.col("rn"), F.col("cents")
    pos = (
        F.when(n == 1, "single")
        .when(rn == 1, "first")
        .when(rn == n, "last")
        .otherwise("middle")
    )
    credit = (
        F.when(n == 1, cents)
        .when(
            (rn == 1) | (rn == n), F.round(cents * 2 / F.lit(5.0)).cast("long")
        )
        .otherwise(F.round(cents / (F.lit(5.0) * (n - 2))).cast("long"))
    )
    c = t.select("user_id", "pid", pos.alias("pos"), credit.alias("credit"))
    return c.groupBy("user_id").agg(
        F.countDistinct("pid").alias("attributed_purchases"),
        F.count("*").alias("touches"),
        F.sum(F.when(F.col("pos") == "single", F.col("credit")).otherwise(0)).alias(
            "single_cents"
        ),
        F.sum(F.when(F.col("pos") == "first", F.col("credit")).otherwise(0)).alias(
            "first_cents"
        ),
        F.sum(F.when(F.col("pos") == "middle", F.col("credit")).otherwise(0)).alias(
            "middle_cents"
        ),
        F.sum(F.when(F.col("pos") == "last", F.col("credit")).otherwise(0)).alias(
            "last_cents"
        ),
        F.sum("credit").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# Scale diagnostics: key-distribution skew report
# ---------------------------------------------------------------------------


@register(
    "key_skew_report",
    # The report every salting/AQE decision starts from: per event_type,
    # how concentrated is the user_id key distribution. Gini comes out of
    # the closed form (2*sum(rank*c) - (n+1)*total) / (n*total) — an
    # integer numerator and denominator with ONE final divide+round, so
    # no cross-engine float accumulation anywhere.
    oracle="""
WITH c AS (SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2),
r AS (SELECT event_type, user_id, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY c ASC, user_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nk
      FROM c)
SELECT event_type,
       CAST(max(nk) AS INTEGER) AS n_keys,
       CAST(sum(c) AS BIGINT) AS total_events,
       CAST(max(c) AS BIGINT) AS max_count,
       round(max(c) / sum(c), 4) AS max_share,
       round(sum(CASE WHEN rn > nk - 10 THEN c ELSE 0 END) / sum(c), 4)
         AS top10_share,
       round((2 * sum(rn * c) - (max(nk) + 1) * sum(c))
             / (max(nk) * sum(c)), 4) AS gini
FROM r GROUP BY 1
""",
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics per event_type over user_id: key count, hot-key
    and top-10 share, and the Gini coefficient of the per-key count
    distribution. One (type,user) groupBy (map-side combined) then one
    per-type window over the already-aggregated key rows — the window
    sees |keys| rows, never events."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    wr = Window.partitionBy("event_type").orderBy(F.col("c").asc(), "user_id")
    wn = Window.partitionBy("event_type")
    r = c.withColumn("rn", F.row_number().over(wr)).withColumn(
        "nk", F.count("*").over(wn)
    )
    total = F.sum("c")
    nk = F.max("nk")
    # Gini moments accumulate AS decimal(38,0): sum(rn·c) is bounded by
    # n_keys × total_events (~1e21 at 1e9 keys / 1e12 events), past int64 —
    # the same silent-wrap-vs-HUGEINT-oracle class as the OLS trend fix
    # below (r9 ADVICE). The denominator n_keys × total overflows the same
    # way, so both sides go through decimal and ONE final double divide.
    dec = "decimal(38,0)"
    sum_rc = F.sum(F.col("rn").cast(dec) * F.col("c").cast(dec))
    nk_d, total_d = nk.cast(dec), total.cast(dec)
    return r.groupBy("event_type").agg(
        nk.cast("int").alias("n_keys"),
        total.alias("total_events"),
        F.max("c").alias("max_count"),
        F.round(F.max("c") / total, 4).alias("max_share"),
        F.round(
            F.sum(F.when(F.col("rn") > F.col("nk") - 10, F.col("c")).otherwise(0))
            / total,
            4,
        ).alias("top10_share"),
        F.round(
            (2 * sum_rc - (nk_d + 1) * total_d).cast("double")
            / ((nk_d * total_d).cast("double")),
            4,
        ).alias("gini"),
    )


@register(
    "revenue_trend_by_type",
    # Integer-exact OLS: x = minute index from the global min minute
    # (slope is shift-invariant; one scalar anchor), y = per-minute
    # revenue in cents. All five sufficient statistics (n, Σx, Σy, Σxx,
    # Σxy) are exact int64 sums; the slope/intercept numerators and
    # denominators are formed in HUGEINT/decimal(38) (n·Σxy overflows
    # int64) and only the final division is floating point — both
    # engines divide the SAME exact integers, so round() is bit-stable.
    oracle="""
WITH p AS (
  SELECT event_type,
    CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
anchor AS (SELECT min(minute) AS m0 FROM p),
m AS (
  SELECT event_type, minute - a.m0 AS x, CAST(sum(cents) AS BIGINT) AS y
  FROM p CROSS JOIN anchor a GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*) AS n,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(x * x) AS HUGEINT) AS sxx,
    CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM m GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_minutes,
  round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6)
    AS slope_cents_per_min,
  round(CAST(sy - (CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)) * sx
        AS DOUBLE) / n, 4) AS intercept_cents
FROM s
""",
)
def q_revenue_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value trend: ordinary least squares over the
    per-minute cents series, computed from exact integer sufficient
    statistics (cross terms accumulate AS decimal(38), mirroring the
    oracle's HUGEINT sums — per-row x·y products and the running sum
    would otherwise wrap int64 at larger fixtures) so a distributed
    aggregation hash-matches the SQL replay at
    round(6) with no fp-summation-order exposure. One scan + one
    (type, minute) agg + one per-type agg; the min-minute anchor is a
    1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 60).cast("long").alias("minute"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    anchor = p.agg(F.min("minute").alias("m0"))
    m = (
        p.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            (F.col("minute") - F.col("m0")).alias("x"),
            "cents",
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    dec = "decimal(38,0)"
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )
    n_d = F.col("n").cast(dec)
    slope_num = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    slope_den = (n_d * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = slope_num / slope_den
    return s.select(
        "event_type",
        F.col("n").alias("n_minutes"),
        F.round(slope, 6).alias("slope_cents_per_min"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n"),
            4,
        ).alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# Single-pass table profiling (Deequ/dbt-profiler analyzer tier)
# ---------------------------------------------------------------------------

_ORDERS_PROFILE_COLS = {
    "o_orderkey": "num",
    "o_custkey": "num",
    "o_totalprice": "num",
    "o_orderstatus": "str",
    "o_orderpriority": "str",
    "o_orderdate": "other",
}


def _orders_profile_oracle() -> str:
    from ecommerce_data_pipeline_spark.operators.profile import (
        profile_oracle_sql,
    )

    return profile_oracle_sql("orders", _ORDERS_PROFILE_COLS)


@register("orders_column_profile", oracle=_orders_profile_oracle())
def q_orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile in ONE scan (operators/profile.py): per
    column the row/null counts, EXACT distinct count, domain min/max and
    a cents-exact mean — the analyzer a curation pipeline runs before
    choosing imputation, bucketing counts, or join strategies. All six
    columns' ``count(distinct)`` live in the same Aggregate: Catalyst
    plans one Expand over one scan (map-side ×k expansion, partial aggs
    before the shuffle), instead of the naive column-per-job profiler
    that reads a 100 TB table six times. Means use the money_sum cents
    discipline so the hash never depends on float fold order."""
    from ecommerce_data_pipeline_spark.operators.profile import column_profile

    orders = load_table(spark, sf_dir, "orders")
    return column_profile(orders, list(_ORDERS_PROFILE_COLS))
