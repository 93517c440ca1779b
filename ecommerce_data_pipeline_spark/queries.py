"""Query registry: every implemented operator exposed as a named query.

Each entry is a ``(spark, sf_dir) -> DataFrame`` callable plus (where
SQL-expressible) a DuckDB oracle that computes the identical result on the
same parquet tables. Column names AND dtypes are aligned on both sides;
doubles follow the cents-exact discipline (functions.money_sum) or explicit
matching rounding so value hashes compare bit-stable.

The medallion queries run the real pipeline transforms over the derived
event streams (sources/events.py) — bronze projection, W1 dedup, from_json
parse, enrichment join, minute fact — while their oracles recompute the same
result directly from the ``orders`` table, proving the whole chain
(JSON round-trip included) is lossless.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.functions import money_sum, money_sum_sql
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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared oracle SQL fragments
# ---------------------------------------------------------------------------

# The deterministic payments stream, reconstructed in SQL exactly as
# sources/events.py derives it (integer-exact cents splits by orderkey residue).
PAY_SQL = """
pay_legs AS (
  SELECT o_orderkey AS order_key, o_orderdate AS order_ts,
    CASE
      WHEN o_orderkey % 10 = 1 THEN CAST(floor(CAST(round(o_totalprice*100) AS BIGINT)/2) AS BIGINT)
      WHEN o_orderkey % 10 = 2 THEN CAST(floor(CAST(round(o_totalprice*100) AS BIGINT)*6/10) AS BIGINT)
      WHEN o_orderkey % 10 = 3 THEN CAST(round(o_totalprice*100) AS BIGINT)
           + CAST(floor(CAST(round(o_totalprice*100) AS BIGINT)/10) AS BIGINT)
      ELSE CAST(round(o_totalprice*100) AS BIGINT)
    END AS amount_cents, 1 AS seq
  FROM orders WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT o_orderkey, o_orderdate,
    CAST(round(o_totalprice*100) AS BIGINT)
      - CAST(floor(CAST(round(o_totalprice*100) AS BIGINT)*6/10) AS BIGINT), 2
  FROM orders WHERE o_orderkey % 10 = 2
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderdate, CAST(999 AS BIGINT), 1
  FROM orders WHERE o_orderkey % 997 = 0
),
pay AS (
  SELECT 'payments.events' AS topic,
    CAST(order_key % 6 AS INTEGER) AS partition,
    row_number() OVER (PARTITION BY order_key % 6
      ORDER BY order_ts + to_seconds(30 + order_key % 570 + seq*60),
               CAST(order_key AS VARCHAR)) - 1 AS "offset",
    order_ts + to_seconds(30 + order_key % 570 + seq*60) AS kafka_timestamp,
    order_key, amount_cents
  FROM pay_legs
),
pay_agg AS (
  SELECT order_key, sum(amount_cents)/100.0 AS paid_raw,
         max(kafka_timestamp) AS last_ts
  FROM pay GROUP BY 1
),
enriched AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
    concat('user', CAST(o_custkey AS VARCHAR), '@example.com') AS user_id,
    round(o_totalprice, 2) AS total_amount,
    'USD' AS currency,
    round(coalesce(p.paid_raw, 0), 2) AS paid_amount,
    round(coalesce(p.paid_raw, 0), 2) >= round(o_totalprice, 2) AS fully_paid,
    date_trunc('second', o_orderdate) AS order_ts,
    p.last_ts AS last_payment_ts,
    greatest(date_trunc('second', o_orderdate),
             coalesce(p.last_ts, date_trunc('second', o_orderdate))) AS updated_ts,
    o_orderkey, o_orderdate
  FROM orders LEFT JOIN pay_agg p ON p.order_key = o_orderkey
)
"""

# DuckDB twin of operators.dedup._md5_long: first 15 hex chars of md5 as int64.
def md5_long_sql(expr: str) -> str:
    return (
        "CAST(list_sum([CAST(strpos('0123456789abcdef', substr(md5("
        + expr
        + "), i, 1)) - 1 AS BIGINT) * CAST(16**(15-i) AS BIGINT) "
        "for i in generate_series(1, 15)]) AS BIGINT)"
    )


def _anchor_join(df: DataFrame, anchor_col) -> DataFrame:
    """Cross-join a 1-row max() anchor (broadcast) for deterministic
    'relative to data head' time windows."""
    anchor = df.agg(anchor_col.alias("__anchor"))
    return df.crossJoin(F.broadcast(anchor))


# ---------------------------------------------------------------------------
# Medallion pipeline queries (reference parity)
# ---------------------------------------------------------------------------


@register(
    "silver_orders_clean",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
         CAST(o_orderkey % 6 AS INTEGER) AS part,
         row_number() OVER (PARTITION BY o_orderkey % 6
             ORDER BY o_orderdate + INTERVAL 1 SECOND,
                      CAST(o_orderkey AS VARCHAR)) - 1 AS off
  FROM orders
), items AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
SELECT 'orders.events' AS topic, part AS partition, off AS "offset",
  o_orderdate + INTERVAL 1 SECOND AS kafka_timestamp,
  'order.created' AS event_type,
  CAST(o_orderkey AS VARCHAR) AS order_id,
  concat('user', CAST(o_custkey AS VARCHAR), '@example.com') AS user_id,
  'USD' AS currency,
  round(o_totalprice, 2) AS total_amount,
  'CREATED' AS status,
  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS event_time,
  sha256(concat('evt:', CAST(o_orderkey AS VARCHAR))) AS event_id,
  date_trunc('second', o_orderdate) AS event_ts,
  CAST(date_trunc('second', o_orderdate) AS DATE) AS event_date,
  CAST(coalesce(i.n, 0) AS INTEGER) AS n_items
FROM base LEFT JOIN items i ON i.l_orderkey = o_orderkey
""",
)
def silver_orders_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver for order.created: projection (P1) → W1 dedup →
    from_json parse (P2) → derived times (P3). Proves the JSON round trip is
    lossless; `items` is carried as its size (array-of-struct hashing is
    covered in unit tests)."""
    raw = orders_events(spark, sf_dir)
    clean = parse_orders(kafka_identity_dedup(bronze_projection(raw)))
    return clean.select(
        "topic",
        "partition",
        "offset",
        "kafka_timestamp",
        "event_type",
        "order_id",
        "user_id",
        "currency",
        "total_amount",
        "status",
        "event_time",
        "event_id",
        "event_ts",
        "event_date",
        F.coalesce(F.size("items"), F.lit(0)).alias("n_items"),
    )


@register(
    "silver_payments_clean",
    oracle=f"""
WITH {PAY_SQL}
SELECT topic, partition, "offset", kafka_timestamp,
  CAST(order_key AS VARCHAR) AS order_id,
  amount_cents/100.0 AS amount,
  'USD' AS currency,
  'succeeded' AS status,
  CAST(NULL AS VARCHAR) AS method,
  sha256(concat('evt:payments.events:', CAST(partition AS VARCHAR), ':', CAST("offset" AS VARCHAR))) AS event_id,
  sha256(concat('pay:payments.events:', CAST(partition AS VARCHAR), ':', CAST("offset" AS VARCHAR))) AS payment_id,
  kafka_timestamp AS event_ts,
  CAST(kafka_timestamp AS DATE) AS event_date
FROM pay
""",
)
def silver_payments_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver for payment.succeeded: flat-payload parse, cents→dollars,
    sha256 synthetic ids, Kafka-timestamp-as-event-time (silver_payments.py
    parity, including its quirks)."""
    raw = payments_events(spark, sf_dir)
    clean = parse_payments(kafka_identity_dedup(bronze_projection(raw)))
    return clean.select(
        "topic",
        "partition",
        "offset",
        "kafka_timestamp",
        "order_id",
        "amount",
        "currency",
        "status",
        "method",
        "event_id",
        "payment_id",
        "event_ts",
        "event_date",
    )


@register(
    "order_payments_enriched",
    oracle=f"""
WITH {PAY_SQL}
SELECT order_id, user_id, total_amount, currency, paid_amount, fully_paid,
       order_ts, last_payment_ts, updated_ts
FROM enriched
""",
)
def order_payments_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full silver chain + A1/J1 enrichment: one row per order with
    paid_amount (coalesced 0.0), fully_paid, updated_ts
    (silver_enrich.py:32-44 semantics). Orphan payments drop out; unpaid /
    partial / split / overpaid orders all present via the fixture residues."""
    orders_clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    payments_clean = parse_payments(
        kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
    )
    return enrich_orders(orders_clean, payments_clean)


@register(
    "fct_sales_minute",
    oracle=f"""
WITH {PAY_SQL}
SELECT date_trunc('minute', o_orderdate) AS minute_bucket,
  {money_sum_sql('total_amount')} AS gmv,
  count(*) AS paid_orders
FROM enriched WHERE fully_paid
GROUP BY 1
""",
)
def fct_sales_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gold fact end-to-end: events → silver → enrich → paid-only
    inner join → minute-bucket agg (fct_sales_minute.sql:8-41).
    processed_ts (current_timestamp) excluded — run-dependent."""
    orders_clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    payments_clean = parse_payments(
        kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
    )
    enriched = enrich_orders(orders_clean, payments_clean)
    return sales_minute_agg(orders_clean, enriched).drop("processed_ts")


@register(
    "recent_sales_top10",
    oracle=f"""
WITH {PAY_SQL},
fct AS (
  SELECT date_trunc('minute', o_orderdate) AS minute_bucket,
    {money_sum_sql('total_amount')} AS gmv,
    count(*) AS paid_orders
  FROM enriched WHERE fully_paid GROUP BY 1
)
SELECT minute_bucket, gmv, paid_orders FROM fct
ORDER BY minute_bucket DESC LIMIT 10
""",
)
def recent_sales_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: the README dashboard query (README.md:159-162) — latest 10 minute
    buckets. Physical plan is TakeOrderedAndProject: no global sort."""
    return (
        fct_sales_minute(spark, sf_dir)
        .orderBy(F.col("minute_bucket").desc())
        .limit(10)
    )


@register(
    "paid_orders_recent",
    oracle=f"""
WITH {PAY_SQL}
SELECT order_id, user_id, total_amount, paid_amount, updated_ts
FROM enriched WHERE fully_paid
ORDER BY updated_ts DESC, order_id LIMIT 20
""",
)
def paid_orders_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:164-167: latest fully-paid orders over the enriched view."""
    return (
        order_payments_enriched(spark, sf_dir)
        .filter(F.col("fully_paid"))
        .orderBy(F.col("updated_ts").desc(), F.col("order_id"))
        .limit(20)
        .select("order_id", "user_id", "total_amount", "paid_amount", "updated_ts")
    )


# ---------------------------------------------------------------------------
# Operational event analytics (events table: dense 30-day stream)
# ---------------------------------------------------------------------------


@register(
    "events_minute_fact",
    oracle=f"""
SELECT date_trunc('minute', ts) AS minute_bucket,
  {money_sum_sql('value')} AS gmv,
  count(*) AS purchases
FROM events WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def events_minute_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 on the dense stream: per-minute purchase rollup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_bucket"))
        .agg(money_sum("value").alias("gmv"), F.count(F.lit(1)).alias("purchases"))
    )


@register(
    "events_last_hour",
    oracle=f"""
WITH fct AS (
  SELECT date_trunc('minute', ts) AS minute_bucket,
    {money_sum_sql('value')} AS gmv,
    count(*) AS purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT minute_bucket, gmv, purchases FROM fct
WHERE minute_bucket >= (SELECT max(minute_bucket) FROM fct) - INTERVAL 60 MINUTE
""",
)
def events_last_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: vw_sales_last_60min semantics, anchored at the data head (max
    bucket) instead of current_timestamp for determinism."""
    fct = events_minute_fact(spark, sf_dir)
    anchored = _anchor_join(fct, F.max("minute_bucket"))
    return anchored.filter(
        F.col("minute_bucket")
        >= F.timestamp_add("MINUTE", F.lit(-60), F.col("__anchor"))
    ).select("minute_bucket", "gmv", "purchases")


@register(
    "events_incremental_2h",
    oracle=f"""
SELECT date_trunc('minute', ts) AS minute_bucket,
  {money_sum_sql('value')} AS gmv,
  count(*) AS purchases
FROM events
WHERE event_type = 'purchase'
  AND ts >= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
GROUP BY 1
""",
)
def events_incremental_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/ST5: the 2-hour incremental lookback slice — the set of minute
    buckets a late-data MERGE run would recompute (fct_sales_minute.sql:35-40)."""
    ev = load_table(spark, sf_dir, "events")
    anchored = _anchor_join(ev, F.max("ts"))
    return (
        anchored.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.timestamp_add("HOUR", F.lit(-2), F.col("__anchor")))
        )
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_bucket"))
        .agg(money_sum("value").alias("gmv"), F.count(F.lit(1)).alias("purchases"))
    )


@register(
    "freshness_by_type",
    oracle="""
SELECT event_type, max(ts) AS max_event_ts, count(*) AS n_events
FROM events GROUP BY 1
""",
)
def freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: freshness probe — max event time per stream (README.md:214-220)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.max("ts").alias("max_event_ts"), F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "user_current_state",
    oracle="""
SELECT user_id, event_type AS current_state, ts AS state_ts
FROM (
  SELECT user_id, event_type, ts,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def user_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 as a batch view: last event per key = current state of the keyed
    state machine (order CREATED→PAID, shipment transitions)."""
    cur = win.current_state(
        load_table(spark, sf_dir, "events"), "user_id", "ts", "event_id"
    )
    return cur.select(
        "user_id",
        F.col("event_type").alias("current_state"),
        F.col("ts").alias("state_ts"),
    )


@register(
    "user_sessions",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), ids AS (
  SELECT user_id, ts, value,
    -- CAST: DuckDB integer sum() yields HUGEINT (int128); Spark emits int64.
    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end,
  {money_sum_sql('value')} AS total_value
FROM ids GROUP BY 1, 2
""",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum."""
    return win.sessionize(load_table(spark, sf_dir, "events"))


@register(
    "events_json_props",
    oracle="""
SELECT event_id, user_id, ts,
  CAST(props->>'$.k' AS INTEGER) AS k_val
FROM events
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 on real stored JSON: schema-on-read extraction from the props blob."""
    from ecommerce_data_pipeline_spark.schemas import EVENT_PROPS_SCHEMA

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.from_json(F.col("props"), EVENT_PROPS_SCHEMA).getField("k").alias("k_val"),
    )


@register(
    "catalog_search_page",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_retailprice
FROM part
WHERE contains(p_name, 'red')
ORDER BY p_partkey
LIMIT 50 OFFSET 20
""",
)
def catalog_search_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/O2: catalog substring search + deterministic keyset paging
    (services/catalog/app/api/products.py:20-35)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").contains("red"))
        .orderBy("p_partkey")
        .offset(20)
        .limit(50)
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# SQL surface (S4/S10): the same query text runs via spark.sql() and DuckDB
# ---------------------------------------------------------------------------

_SQL_SURFACE = """
SELECT date_trunc('minute', ts) AS minute_bucket,
       sum(CAST(round(value*100) AS BIGINT))/CAST(100.0 AS DOUBLE) AS gmv,
       count(*) AS purchases
FROM events
WHERE event_type = 'purchase'
GROUP BY date_trunc('minute', ts)
ORDER BY minute_bucket DESC
LIMIT 15
"""


@register("sql_recent_purchase_minutes", oracle=_SQL_SURFACE)
def sql_recent_purchase_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S10: the Trino-style interactive SQL surface — temp views +
    spark.sql() with dialect-shared SQL text (README.md:154-190). The exact
    same string is the oracle."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_SQL_SURFACE)


# ---------------------------------------------------------------------------
# Service-tier aggregates (A5/A6)
# ---------------------------------------------------------------------------


@register(
    "cart_totals",
    oracle="""
SELECT l_orderkey AS order_id,
  CAST(count(*) AS BIGINT) AS n_items,
  sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice/l_quantity*100) AS BIGINT))/100.0 AS cart_total
FROM lineitem GROUP BY 1
""",
)
def q_cart_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: cents-exact cart total per order (routes.py:140-147 semantics)."""
    return cart_totals(load_table(spark, sf_dir, "lineitem"))


@register(
    "inventory_counters",
    oracle="""
SELECT l_partkey AS product_id,
  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS reserved_qty,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS committed_qty,
  count(*) AS n_movements
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
""",
)
def q_inventory_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-product reserve/commit counters (inventory.py:52-125)."""
    return inventory_counters(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


# ---------------------------------------------------------------------------
# LLM-training-data operators: dedup family (documents table)
# ---------------------------------------------------------------------------

# DuckDB twin of operators.dedup.char_shingles + exact pairwise Jaccard.
def _jaccard_pairs_sql(k: int = 12, threshold: float = 0.5) -> str:
    return f"""
sh AS (
  SELECT doc_id, unnest(list_distinct([substr(lower(text), i, {k})
    for i in generate_series(1, greatest(length(text)-{k - 1}, 1))])) AS shingle
  FROM documents
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_id_a, doc_id_b,
         round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
  FROM inter
  JOIN cnt ca ON ca.doc_id = doc_id_a
  JOIN cnt cb ON cb.doc_id = doc_id_b
  WHERE round(i * 1.0 / (ca.n + cb.n - i), 4) >= {threshold}
)
"""


@register(
    "exact_dedup",
    oracle="""
SELECT min(doc_id) AS doc_id, md5(text) AS content_hash, count(*) AS dup_count
FROM documents GROUP BY md5(text)
""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-partitioned groupBy on the content digest."""
    return dd.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "ngram_jaccard_pairs",
    oracle=f"WITH {_jaccard_pairs_sql()} SELECT doc_id_a, doc_id_b, jaccard FROM jac",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-12-gram Jaccard near-dup pairs (threshold 0.5)."""
    return dd.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "minhash_lsh_pairs",
    # Oracle = exact Jaccard at the same threshold: the corpus similarity
    # distribution is bimodal (near-dups >=0.9, background <0.2), where
    # 32x4-band LSH recall is 1-5e-15 — LSH + exact verification therefore
    # equals the exact answer. Deliberately NOT an oracle that re-implements
    # LSH: this checks the algorithm's contract, not its internals.
    oracle=f"WITH {_jaccard_pairs_sql()} SELECT doc_id_a, doc_id_b, jaccard FROM jac",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128)+LSH(32x4) candidate pairs, exact-verified at 0.5."""
    return dd.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


# DuckDB twin of operators.dedup.simhash: identical md5-derived 60-bit
# hashes, per-bit majority votes, 63-bit signature.
def _simhash_sql(k: int = 12, bits: int = 64) -> str:
    mdl = md5_long_sql("shingle")
    votes = ", ".join(f"sum((h >> {b}) & 1) AS v{b}" for b in range(bits - 1))
    terms = " + ".join(
        f"CASE WHEN 2*v{b} > n THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits - 1)
    )
    return f"""
sh AS (
  SELECT doc_id, unnest(list_distinct([substr(lower(text), i, {k})
    for i in generate_series(1, greatest(length(text)-{k - 1}, 1))])) AS shingle
  FROM documents
),
hashed AS (SELECT doc_id, {mdl} AS h FROM sh),
votes AS (SELECT doc_id, count(*) AS n, {votes} FROM hashed GROUP BY 1),
sim AS (SELECT doc_id, {terms} AS simhash FROM votes)
"""


@register(
    "simhash",
    oracle=f"WITH {_simhash_sql()} SELECT doc_id, simhash FROM sim",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """63-bit SimHash signatures (majority vote over shingle-hash bits)."""
    return dd.simhash(load_table(spark, sf_dir, "documents"))


@register(
    "simhash_pairs",
    oracle=f"""
WITH {_simhash_sql()}
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, Hamming <= 3, 16-bit-band blocked. The
    oracle is the quadratic filter; band blocking is exact by pigeonhole."""
    return dd.simhash_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# LLM-training-data operators: similarity search (embeddings table)
# ---------------------------------------------------------------------------

_COSINE_SQL = """
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 50 = 0),
v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv,
             label FROM embeddings),
"""


@register(
    "cosine_topk",
    oracle=f"""
WITH {_COSINE_SQL}
scored AS (
  SELECT query_id, neighbor_id,
    round(list_inner_product(qv, nv)
          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(nv, nv))), 4)
      AS cosine_sim
  FROM q, v WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for every 50th vector as query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.cosine_topk(emb, queries_df, k=5)


@register(
    "ivf_topk",
    oracle=f"""
WITH {_COSINE_SQL}
qc AS (SELECT q.query_id, q.qv, e.label AS cell
       FROM q JOIN embeddings e ON e.vec_id = q.query_id),
scored AS (
  SELECT query_id, neighbor_id,
    round(list_inner_product(qv, nv)
          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(nv, nv))), 4)
      AS cosine_sim
  FROM qc JOIN v ON v.label = qc.cell AND v.neighbor_id <> qc.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3
""",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: prune to the query's cell (label = coarse-quantizer
    stand-in), then exact top-3 inside the cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.ivf_topk(emb, queries_df, k=3)


# ---------------------------------------------------------------------------
# LLM-training-data operators: text analysis (documents table)
# ---------------------------------------------------------------------------

_WORDS_SQL = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '), "
    "w -> w <> '')"
)


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang]) + "]"


@register(
    "language_id",
    oracle=f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
r AS (
  SELECT doc_id, CAST(len(words) AS INTEGER) AS n_tokens,
    {", ".join(
        f"round(len(list_filter(words, t -> list_contains({_sw_list(lang)}, t)))*1.0"
        f" / greatest(len(words), 1), 4) AS r_{lang}"
        for lang in tx.STOPWORDS
    )}
  FROM w
)
SELECT doc_id, n_tokens, r_en AS en_ratio,
  CASE WHEN greatest(r_en, r_es, r_fr, r_de) <= 0 THEN 'und'
       {" ".join(
           f"WHEN r_{lang} = greatest(r_en, r_es, r_fr, r_de) THEN '{lang}'"
           for lang in tx.STOPWORDS
       )}
  END AS predicted_lang
FROM r
""",
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID over documents."""
    return tx.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "quality_score",
    oracle=f"""
WITH w AS (
  SELECT doc_id, text, {_WORDS_SQL} AS words,
    CAST(length(text) AS INTEGER) AS n_chars,
    CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS INTEGER) AS alpha_chars
  FROM documents
),
f AS (
  SELECT doc_id, n_chars, CAST(len(words) AS INTEGER) AS n_tokens,
    round(coalesce(list_sum(list_transform(words, t -> length(t))), 0) * 1.0
          / greatest(len(words), 1), 4) AS mean_token_len,
    round(alpha_chars * 1.0 / greatest(n_chars, 1), 4) AS alpha_ratio,
    round(len(list_filter(words, t -> list_contains({_sw_list("en")}, t))) * 1.0
          / greatest(len(words), 1), 4) AS stopword_ratio
  FROM w
)
SELECT doc_id, n_chars, n_tokens, mean_token_len, alpha_ratio, stopword_ratio,
  round(
    (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN mean_token_len BETWEEN 3 AND 10 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN alpha_ratio >= 0.8 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0.0 END), 2) AS quality_score
FROM f
""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-shaped quality features + composite score."""
    return tx.quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "token_stats",
    oracle="""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INTEGER) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_ish_tokens,
  CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS INTEGER) AS distinct_tokens
FROM documents
""",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    return tx.token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "fingerprint",
    oracle="""
SELECT doc_id, md5(lower(text)) AS content_md5,
  list_aggregate([md5(substr(lower(text), i, 16))
    for i in generate_series(1, greatest(length(text)-15, 1))], 'min') AS min_shingle_md5
FROM documents
""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content md5 + winnowing-style min-shingle-hash fingerprint."""
    return tx.fingerprint(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# LLM-training-data operators: multimodal plumbing (documents as payloads)
# ---------------------------------------------------------------------------


@register(
    "decode_media_features",
    oracle="""
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  'fake' AS format,
  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
  CAST((coalesce(ascii(substr(text, 1, 1)), 0) * 31 + octet_length(encode(text)))
       % 1000003 AS BIGINT) AS checksum_mod
FROM documents
""",
)
def q_decode_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one honest Pandas path: binary payloads through an Arrow-batched
    mapInPandas decode kernel (deterministic stub — codecs not bundled).
    The oracle replicates the stub's arithmetic; text is ASCII so the first
    utf-8 byte equals ascii(first char)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_features(attach_binary_payload(docs))


@register(
    "frame_sample_plan",
    oracle="""
SELECT doc_id,
  CAST(unnest(generate_series(0,
       CAST(floor(octet_length(encode(text))/1000) AS INTEGER), 10)) AS INTEGER)
    AS frame_idx
FROM documents
""",
)
def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index."""
    from ecommerce_data_pipeline_spark.operators.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(attach_binary_payload(docs))


# ---------------------------------------------------------------------------
# Streaming layer (ST1-ST5) + ST7 state machine as registry queries
# ---------------------------------------------------------------------------


@register(
    "streaming_fct_sales_minute",
    # Same oracle as fct_sales_minute: micro-batched ingest through the
    # checkpointed streaming medallion must land on the identical gold fact.
    oracle=f"""
WITH {PAY_SQL}
SELECT date_trunc('minute', o_orderdate) AS minute_bucket,
  {money_sum_sql('total_amount')} AS gmv,
  count(*) AS paid_orders
FROM enriched WHERE fully_paid
GROUP BY 1
""",
)
def q_streaming_fct_sales_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1-ST4 end-to-end: stage the event streams as files, ingest them as
    checkpointed micro-batches (availableNow; maxFilesPerTrigger=2 over 8
    files → 4 batches/stream), run silver as foreachBatch MERGE, then
    enrich+gold — and return the gold fact. Equality with the batch oracle
    proves trigger-shape independence."""
    import tempfile

    from ecommerce_data_pipeline_spark import pipeline as pl
    from ecommerce_data_pipeline_spark.streaming import (
        run_streaming_pipeline,
        stage_event_files,
    )

    import shutil

    root = tempfile.mkdtemp(prefix="stream_fct_")
    try:
        o_src, p_src = f"{root}/src/orders", f"{root}/src/payments"
        o_schema = stage_event_files(spark, orders_events(spark, sf_dir), o_src)
        p_schema = stage_event_files(spark, payments_events(spark, sf_dir), p_src)
        # Unpartitioned silver: the fixture's order dates scatter uniformly
        # over ~7 years, so date-partitioned micro-batch merges would rewrite
        # every partition every batch (see Lakehouse docstring).
        lake = pl.Lakehouse(f"{root}/lake", partition_silver=False)
        run_streaming_pipeline(
            spark, lake, o_src, p_src, o_schema, p_schema, f"{root}/ckpt"
        )
        # Pin the (minute-grain, small) fact in the block manager so the
        # working tree — staged streams, lakehouse, checkpoints — can be
        # deleted before returning; repeated registry runs must not
        # accumulate temp dirs.
        return (
            lake.fct_sales_minute.read(spark)
            .drop("processed_ts")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "order_status_current",
    oracle=f"""
WITH {PAY_SQL},
pay_known AS (
  SELECT order_key, kafka_timestamp FROM pay
  JOIN orders ON o_orderkey = order_key
),
agg AS (
  SELECT order_key, count(*) AS n_pay, min(kafka_timestamp) AS first_pay
  FROM pay_known GROUP BY 1
)
SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
  CASE WHEN a.order_key IS NOT NULL THEN 'PAID' ELSE 'CREATED' END AS state,
  CASE WHEN a.order_key IS NOT NULL THEN a.first_pay
       ELSE date_trunc('second', o_orderdate) END AS state_ts,
  CAST(1 + coalesce(a.n_pay, 0) AS BIGINT) AS n_events
FROM orders LEFT JOIN agg a ON a.order_key = o_orderkey
""",
)
def q_order_status_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 as a monotone fold: CREATED→PAID per order, first PAID event
    wins (consumer.py:52-77 idempotent-skip semantics); payment events for
    unknown orders are dropped like the consumer's failed lookup."""
    from ecommerce_data_pipeline_spark.operators.state import fold_state_events

    orders_clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    payments_clean = parse_payments(
        kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
    )
    known = orders_clean.select("order_id").distinct()
    ev = orders_clean.select(
        "order_id", F.lit("CREATED").alias("state"), F.col("event_ts")
    ).unionByName(
        payments_clean.join(known, "order_id", "left_semi").select(
            "order_id", F.lit("PAID").alias("state"), F.col("event_ts")
        )
    )
    return fold_state_events(ev)


@register(
    "embedding_near_dup_pairs",
    oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
  round(list_inner_product(a.e, b.e)
        / (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4)
    AS cosine_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_inner_product(a.e, b.e)
        / (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4)
      >= 0.4
""",
)
def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact — block-matrix BLAS kernel
    (similarity.embedding_near_dup_pairs_blocked; ~15x the throughput of
    the zip_with/aggregate expression form, which remains as the
    pure-built-in verifier twin, equality-tested in tests/). Threshold 0.4
    because the synthetic corpus has no true near-dups (max pairwise
    cosine ≈0.51) — this exercises the operator on a non-trivial result
    set."""
    return sim.embedding_near_dup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "notification_emails",
    oracle=f"""
WITH {PAY_SQL}
SELECT CAST(p.order_key AS VARCHAR) AS order_id,
  sha256(concat('pay:payments.events:', CAST(p.partition AS VARCHAR), ':',
                CAST(p."offset" AS VARCHAR))) AS payment_id,
  concat('user', CAST(o.o_custkey AS VARCHAR), '@example.com') AS user_email,
  p.amount_cents/100.0 AS amount,
  p.kafka_timestamp AS event_ts
FROM pay p JOIN orders o ON o.o_orderkey = p.order_key
""",
)
def q_notification_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/ST8: the notifications service's order_id→email cache expressed
    as a join — every payment event enriched with the buyer's email from
    the order stream (notifications/app/kafka/consumer.py:13-16,46-94).
    Orphan payments drop out exactly like a cache miss does. In streaming
    this is a stream-static join of the payment stream against silver
    orders (bounded state — no stream-stream buffer)."""
    orders_clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    payments_clean = parse_payments(
        kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
    )
    return payments_clean.join(
        orders_clean.select("order_id", F.col("user_id").alias("user_email")),
        "order_id",
    ).select("order_id", "payment_id", "user_email", "amount", "event_ts")


@register(
    "orders_kafka_encoded",
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR) AS key,
  to_json(struct_pack(
    event_type := 'order.created',
    order_id := CAST(o_orderkey AS VARCHAR),
    currency := 'USD',
    status := 'CREATED',
    total_amount := round(o_totalprice, 2)
  )) AS value
FROM orders
""",
)
def q_orders_kafka_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: producer-side Kafka encoding — key by order_id, compact JSON
    value (producer.py:79-80). The result is what df.write.format("kafka")
    would ship; non-null fields only (Spark's to_json drops nulls)."""
    from ecommerce_data_pipeline_spark.sources.sinks import to_kafka_shape

    clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    encoded = clean.select(
        "order_id",
        F.col("event_type"),
        F.col("currency"),
        F.col("status"),
        F.col("total_amount"),
    )
    return to_kafka_shape(
        encoded, "order_id", ["event_type", "order_id", "currency", "status", "total_amount"]
    )


@register(
    "language_id_confusion",
    oracle=f"""
WITH w AS (SELECT doc_id, lang, {_WORDS_SQL} AS words FROM documents),
r AS (
  SELECT doc_id, lang,
    {", ".join(
        f"round(len(list_filter(words, t -> list_contains({_sw_list(lang)}, t)))*1.0"
        f" / greatest(len(words), 1), 4) AS r_{lang}"
        for lang in tx.STOPWORDS
    )}
  FROM w
),
p AS (
  SELECT doc_id, lang,
    CASE WHEN greatest(r_en, r_es, r_fr, r_de) <= 0 THEN 'und'
         {" ".join(
             f"WHEN r_{lang} = greatest(r_en, r_es, r_fr, r_de) THEN '{lang}'"
             for lang in tx.STOPWORDS
         )}
    END AS predicted_lang
  FROM r
)
SELECT lang AS true_lang, predicted_lang, count(*) AS n_docs
FROM p GROUP BY 1, 2
""",
)
def q_language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluated against the corpus's stored ground-truth
    ``lang`` column: the (true, predicted) confusion counts — the quality
    metric a training-data pipeline actually tracks for its filters."""
    docs = load_table(spark, sf_dir, "documents")
    pred = tx.language_id(docs)
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred.select("doc_id", "predicted_lang"), "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "kmeans_ivf_topk",
    # Oracle = the exact brute-force top-k: with nprobe == k_cells the
    # multi-probe search scores every cell, so the IVF machinery (k-means
    # fit, cell assignment, per-cell scoring, rank) must reproduce the
    # exact answer bit-for-bit — the same contract tests/test_quantize.py
    # pins. The recall/latency tradeoff of partial probing (nprobe < k)
    # is measured separately by ann_recall_report.
    oracle=f"""
WITH {_COSINE_SQL}
scored AS (
  SELECT query_id, neighbor_id,
    round(list_inner_product(qv, nv)
          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(nv, nv))), 4)
      AS cosine_sim
  FROM q, v WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
""",
)
def q_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a REAL coarse quantizer: deterministic k-means (8
    cells, 3 Lloyd iterations) + multi-probe search probing ALL cells,
    which must equal exact brute force (the oracle). Production tuning
    drops nprobe (e.g. 3/8) for ~nprobe/k of the scoring work at reduced
    recall — that operating point is what ann_recall_report measures."""
    from ecommerce_data_pipeline_spark.operators.quantize import (
        kmeans_fit,
        multiprobe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    centroids = kmeans_fit(emb, k=8, iters=3)
    return multiprobe_topk(emb, queries_df, centroids, k=5, nprobe=8)


@register(
    "events_minute_users",
    oracle="""
SELECT date_trunc('minute', ts) AS minute_bucket,
  count(DISTINCT user_id) AS active_users,
  count(*) AS n_events
FROM events GROUP BY 1
""",
)
def q_events_minute_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per minute, written as the explicit two-phase form
    (dedupe on (bucket,user) first, then count): the partial aggregation of
    the dedupe phase absorbs hot-key skew BEFORE the wide row hits one
    reducer — the shape countDistinct expands to, stated explicitly so the
    skew story is visible in the plan (Expand → partial HashAggregate →
    shuffle → final)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("minute", F.col("ts")).alias("minute_bucket"), "user_id"
    )
    per_user = ev.groupBy("minute_bucket", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_user.groupBy("minute_bucket").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum("n").alias("n_events"),
    )


@register(
    "revenue_by_nation",
    oracle="""
SELECT n_name AS nation, r_name AS region,
  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY 1, 2
""",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic fact-to-dimension star join (orders ⋈ customer ⋈ nation ⋈
    region): nation/region are broadcast (tiny dims at ANY scale factor),
    customer broadcasts until it outgrows the threshold and AQE flips it to
    shuffle — the fact side is never shuffled for the joins, only for the
    final rollup. Cents-exact revenue."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# LLM-training-data operators: curation (PII, sampling, contamination,
# repetition, shard assignment) — operators/curate.py
# ---------------------------------------------------------------------------


@register(
    "redact_pii",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
    text || ' Contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or +1 555-000-1234 at 10.0.0.'
         || CAST(doc_id % 256 AS VARCHAR) || ' now' AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{cu.EMAIL_RE}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(t, '{cu.IPV4_RE}')) AS INTEGER) AS n_ips,
  CAST(len(regexp_extract_all(t, '{cu.PHONE_RE}')) AS INTEGER) AS n_phones,
  regexp_replace(regexp_replace(regexp_replace(
      t, '{cu.EMAIL_RE}', '[EMAIL]', 'g'),
      '{cu.IPV4_RE}', '[IP]', 'g'),
      '{cu.PHONE_RE}', '[PHONE]', 'g') AS redacted_text
FROM d
""",
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails / IPv4 / phones) with counts. The corpus text is
    synthetic and PII-free, so the query plants one deterministic instance
    of each PII kind per document before redacting — the operator itself
    (operators/curate.py:redact_pii) sees ordinary dirty text."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-000-1234 at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" now"),
        ).alias("text"),
    )
    return cu.redact_pii(docs)


@register(
    "stratified_sample",
    oracle=f"""
SELECT doc_id, text, lang, source, n_chars,
  CAST({md5_long_sql("concat(CAST(doc_id AS VARCHAR), ':v1')")} % 10000 AS BIGINT)
    AS sample_bucket
FROM documents
WHERE {md5_long_sql("concat(CAST(doc_id AS VARCHAR), ':v1')")} % 10000
  < CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 2500 ELSE 1000 END
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified Bernoulli sample by language: keep 50% of
    en, 25% of es, 10% otherwise — md5-bucketed, so the verdict per row is
    reproducible across runs/retries/executors (unlike rand()-based
    df.sample, which resamples when a stage retries)."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.stratified_sample(
        docs, rates_bp={"en": 5000, "es": 2500}, default_bp=1000, stratum_col="lang"
    )


@register(
    "ngram_contamination",
    oracle="""
WITH dg AS (
  SELECT doc_id,
    unnest(list_distinct([substr(lower(text), i, 13)
      for i in generate_series(1, greatest(length(text) - 12, 1))])) AS g
  FROM documents
),
eg AS (
  SELECT DISTINCT unnest(list_distinct([substr(lower(text), i, 13)
      for i in generate_series(1, greatest(length(text) - 12, 1))])) AS g
  FROM documents WHERE doc_id % 97 = 0
),
hits AS (
  SELECT doc_id, count(*) AS n FROM dg JOIN eg USING (g) GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
  coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
)
def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-doc count of distinct 13-grams shared
    with the 'benchmark' subset (doc_id % 97 == 0 plays the eval set). The
    eval n-gram set broadcasts; the corpus side is a pure map + broadcast
    join, so the only shuffle is the per-doc hit count."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    return cu.ngram_contamination(docs, eval_docs, n=13)


@register(
    "repetition_stats",
    oracle="""
WITH u AS (
  SELECT doc_id,
    list_filter(string_split(text, '. '), x -> x <> '') AS units
  FROM documents
)
SELECT doc_id,
  CAST(len(units) AS INTEGER) AS n_units,
  CAST(len(list_distinct(units)) AS INTEGER) AS n_distinct_units,
  round((len(units) - len(list_distinct(units))) * 1.0
        / greatest(len(units), 1), 4) AS dup_unit_ratio
FROM u
""",
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style repetitious-content filter):
    share of '. '-delimited units that are duplicates. Pure map stage."""
    return cu.repetition_stats(load_table(spark, sf_dir, "documents"))


@register(
    "shard_assign",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
    {md5_long_sql("concat(CAST(doc_id AS VARCHAR), ':v1')")} AS h
  FROM documents
)
SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS INTEGER)
    AS pos
FROM h
""",
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: md5-hash docs into 8 shards
    with a stable position inside each shard — one hash repartition +
    independent per-shard sorts, no global total order."""
    return cu.shard_assign(load_table(spark, sf_dir, "documents"), n_shards=8)


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
# As-of join, interval-overlap range join, dedup clustering, OLAP shapes
# ---------------------------------------------------------------------------

from ecommerce_data_pipeline_spark.operators import graph as gr  # noqa: E402
from ecommerce_data_pipeline_spark.operators.asof import (  # noqa: E402
    asof_join,
    interval_overlap_pairs,
)


@register(
    "asof_view_before_purchase",
    oracle="""
WITH p AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type='purchase'),
     v AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type='view')
SELECT p.user_id, p.event_id, p.ts, p.value,
  v.ts AS view_ts, v.event_id AS view_event_id, v.value AS view_value,
  date_diff('microsecond', v.ts, p.ts) AS gap_us
FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
""",
)
def q_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution: each purchase joined to the user's most
    recent prior (or simultaneous) page view — the canonical ASOF JOIN,
    which Spark lacks natively. Union-sort plan (operators/asof.py): ONE
    shuffle of |purchases|+|views| rows on user_id, a per-key sort, zero
    row blow-up — vs the naive non-equi join's |P|x|V| per user. Oracle is
    DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof_join(
        p, v, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["event_id", "value"], prefix="view_",
    )
    return out.select(
        "user_id", "event_id", "ts", "value",
        "view_ts", "view_event_id", "view_value",
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


_SESSIONS_SQL = """
flagged AS (
  SELECT user_id, ts,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id,
    -- CAST: DuckDB integer sum() yields HUGEINT (int128); Spark emits int64.
    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT) AS session_id,
    ts
  FROM flagged
),
sessions AS (
  SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
  FROM sess GROUP BY 1, 2
)
"""


@register(
    "session_overlap_pairs",
    oracle=f"""
WITH {_SESSIONS_SQL}
SELECT a.user_id AS a_user_id, a.session_id AS a_session_id,
       b.user_id AS b_user_id, b.session_id AS b_session_id,
       date_diff('microsecond',
                 greatest(a.session_start, b.session_start),
                 least(a.session_end, b.session_end)) AS overlap_us
FROM sessions a JOIN sessions b
  ON a.session_start <= b.session_end
 AND b.session_start <= a.session_end
 AND (a.user_id, a.session_id) < (b.user_id, b.session_id)
 AND a.user_id <> b.user_id
""",
)
def q_session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: concurrent sessions of different users.
    Binned range-join plan (operators/asof.py): sessions explode onto
    1-hour buckets, pairs meet on a bucket equi-join (shuffle keyed by
    bucket — parallel, prunable), the exact overlap predicate filters, and
    the first-shared-bucket rule de-dups without a distinct. The oracle is
    the O(n^2) literal non-equi join — same rows, different plan."""
    sessions = win.sessionize(load_table(spark, sf_dir, "events"))
    pairs = interval_overlap_pairs(
        sessions,
        id_cols=["session_id"],
        start_col="session_start",
        end_col="session_end",
        partition_col="user_id",
        bucket_seconds=3600,
    )
    return pairs.select(
        "a_user_id", "a_session_id", "b_user_id", "b_session_id",
        (
            F.unix_micros(F.least("a_end", "b_end"))
            - F.unix_micros(F.greatest("a_start", "b_start"))
        ).alias("overlap_us"),
    )


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_jaccard_pairs_sql()},
edges AS (
  SELECT doc_id_a AS u, doc_id_b AS v FROM jac
  UNION SELECT doc_id_b, doc_id_a FROM jac
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM edges e JOIN reach ON e.u = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id, min(r) = id AS is_canonical
FROM reach GROUP BY id
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: MinHash+LSH pairs -> connected
    components (iterative min-label propagation, operators/graph.py) ->
    every doc labeled with its cluster's min doc_id and a keep/drop flag.
    THE missing piece between pair detection and an actually-deduplicated
    training corpus. Oracle: recursive-CTE transitive closure over the
    exact-Jaccard pair set (= the LSH pair set on this corpus, separately
    oracle-verified)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs)
    return gr.dedup_clusters(docs, pairs)


@register(
    "revenue_rollup",
    oracle="""
SELECT coalesce(n_name, 'ALL') AS nation,
  CAST(coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS VARCHAR) AS order_year,
  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
""",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ROLLUP: (nation, year) -> nation subtotals -> grand total in
    one pass. Spark plans a single Expand + hash aggregate — partial
    aggregation still map-side, one shuffle for all three grouping levels
    (vs three scans if written as UNION ALL). NULL grouping slots are
    labeled 'ALL' on both sides so the hash compare is unambiguous."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name"),
            F.year("o_orderdate").cast("string").alias("order_year_raw"),
            "o_totalprice",
        )
    )
    return (
        joined.rollup("n_name", "order_year_raw")
        .agg(
            money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("order_year_raw", F.lit("ALL")).alias("order_year"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "orders_status_pivot",
    oracle="""
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p,
  count(*) AS total
FROM orders GROUP BY 1
""",
)
def q_orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with explicit value list: statuses become columns. Listing the
    pivot values keeps it a single-pass conditional aggregation (no extra
    distinct-values job, which at 100 TB is a full shuffle you don't want
    for a known enum)."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    total = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("total"))
    return (
        p.join(total, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
            "total",
        )
    )


@register(
    "top_customers_per_nation",
    oracle="""
WITH spend AS (
  SELECT n_name AS nation, c_custkey, c_name,
    sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total_spend,
    count(*) AS n_orders
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY nation
      ORDER BY total_spend DESC, c_custkey) AS rank
  FROM spend
)
SELECT nation, rank, c_custkey, c_name, total_spend, n_orders
FROM ranked WHERE rank <= 3
""",
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: spend rollup (one shuffle, map-side partial) then a
    per-nation row_number window — Spark runs the window sort WITHIN the
    nation partitions of the aggregate output (already small), never a
    global sort. Deterministic c_custkey tiebreak so top-3 is stable."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey", "c_name")
        .agg(
            money_sum("o_totalprice").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("nation", "rank", "c_custkey", "c_name", "total_spend", "n_orders")
    )


from ecommerce_data_pipeline_spark.operators.asof import resample_locf  # noqa: E402


@register(
    "events_resampled_locf",
    oracle="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
  FROM events GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
  FROM bounds
)
SELECT g.user_id, g.grid_ts, e.ts AS matched_ts, e.value AS matched_value
FROM grid g ASOF JOIN events e ON g.user_id = e.user_id AND e.ts <= g.grid_ts
""",
)
def q_events_resampled_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample: each user's irregular event series onto
    an hourly grid with last-observation-carried-forward. Grid generation
    is distributed (per-key sequence+explode, sized by the key's own
    span); fill is ONE union-sort as-of join — two key shuffles total, no
    per-grid-point probe. Oracle: DuckDB generate_series + ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    return resample_locf(
        ev, on=["user_id"], ts_col="ts", value_cols=["value"],
        step="interval 1 hour", origin_trunc="hour",
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
""",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders since 2000. The anti join
    keeps only the probe side (no payload from orders is materialized),
    the date filter pushes into the orders scan BEFORE the join, and the
    build side reduces to its join key — at scale this is a
    broadcast/shuffled hash anti with the fact side never widened."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "parts_with_shipments",
    oracle="""
SELECT p_partkey, p_name FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
""",
)
def q_parts_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: parts that appear in at least one lineitem.
    Semi-join semantics mean the (much larger) lineitem side contributes
    existence only — no duplication of part rows, no lineitem columns
    read beyond the join key (column pruning to l_partkey)."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return part.join(
        lineitem, part.p_partkey == lineitem.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


@register(
    "purchase_and_error_users",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
""",
)
def q_purchase_and_error_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): users who both purchased and hit errors.
    Plans as an aggregate + semi join on the deduped sides — one shuffle
    each, never a row-multiplying join."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return p.intersect(e)


@register(
    "clean_purchase_days",
    oracle="""
SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'error'
""",
)
def q_clean_purchase_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): (user, day) slots with purchases but no
    errors — dedup + anti join, same single-shuffle shape as INTERSECT."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    return p.subtract(e)


@register(
    "user_value_moving_avg",
    oracle="""
SELECT user_id, event_id, ts,
  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS moving_avg_7,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
FROM events
""",
)
def q_user_value_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME specs: 7-row trailing moving average + running sum per
    user. Both frames share ONE window sort (same partition/order), so the
    plan is a single shuffle + single per-key sort with two frame
    evaluators — adding frames is free once the sort exists. Deterministic
    event_id tiebreak keeps frame contents (and thus fp-sums) stable."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", "ts",
        F.round(F.avg("value").over(w.rowsBetween(-6, 0)), 4).alias("moving_avg_7"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_sum"),
    )


@register(
    "session_window_fact",
    oracle="""
WITH flagged AS (
  -- >= 1800: Spark's session_window opens a NEW session when the gap
  -- equals the gap duration exactly (half-open [start, start+gap) window);
  -- the lag-based formulation must use the same closed/open boundary.
  SELECT user_id, ts, value,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), ids AS (
  SELECT user_id, ts, value,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*) AS n_events,
  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
FROM ids GROUP BY user_id, sid
""",
)
def q_session_window_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (30-min gap): one
    groupBy(user, session_window) hash agg — no lag/running-sum window
    pair, and in streaming the same expression is watermark-mergeable
    state. Session end follows Spark's definition (last event + gap); the
    oracle replicates it from the lag formulation, proving the two
    sessionization paths agree."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_TOKS_SQL = """
toks AS (
  SELECT doc_id, unnest(list_filter(
    string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
    w -> w <> '')) AS token
  FROM documents
),
tfreq AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2)
"""


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH {_TOKS_SQL},
dfreq AS (SELECT token, count(*) AS df FROM tfreq GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, token, tf,
    round(tf * (ln((n.n + 1.0)/(dfreq.df + 1.0)) + 1.0), 4) AS tfidf
  FROM tfreq JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
      ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
SELECT doc_id, token, tf, tfidf FROM ranked WHERE rn <= 5
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — the inverted-index shuffle plus
    two broadcast-sized corpus stats (see operators/text.py)."""
    return tx.tfidf_top_terms(load_table(spark, sf_dir, "documents"), top_k=5)


@register(
    "bm25_search",
    oracle=f"""
WITH {_TOKS_SQL},
q AS (SELECT doc_id, token, tf FROM tfreq
      WHERE token IN ('spark', 'join', 'stream')),
dfreq AS (SELECT token, count(*) AS df FROM q GROUP BY 1),
dl AS (
  SELECT doc_id, len(list_filter(
    string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
    w -> w <> '')) AS dl
  FROM documents
),
stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
scored AS (
  SELECT q.doc_id,
    ln(1.0 + (stats.n - dfreq.df + 0.5)/(dfreq.df + 0.5))
      * (q.tf * 2.2) / (q.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS w
  FROM q JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, round(sum(w), 4) AS score, count(*) AS n_hit_terms
FROM scored GROUP BY 1
ORDER BY score DESC, doc_id LIMIT 10
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the query {spark, join, stream}: term-filtered
    inverted index + broadcast corpus stats + TakeOrdered top-n (no global
    sort). k1=1.2, b=0.75 — so tf*(k1+1)=tf*2.2 and
    1-b+b*dl/avgdl=0.25+0.75*dl/avgdl in the oracle."""
    return tx.bm25_search(
        load_table(spark, sf_dir, "documents"), ["spark", "join", "stream"]
    )


@register(
    "top_tokens",
    oracle=f"""
WITH {_TOKS_SQL}
SELECT token, CAST(sum(tf) AS BIGINT) AS n_occurrences, count(*) AS n_docs
FROM tfreq GROUP BY token
ORDER BY n_occurrences DESC, token LIMIT 50
""",
)
def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies, top-50: explode → two-level count (the
    (doc,token) pre-aggregate bounds the explode shuffle) → global top-k
    via TakeOrdered. Vocabulary-size output regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    t = tx._term_freqs(docs, "text", "doc_id")
    return (
        t.groupBy("token")
        .agg(
            F.sum("tf").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(50)
    )


@register(
    "customer_spend_quartiles",
    oracle="""
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total_spend
  FROM orders GROUP BY 1
)
SELECT o_custkey, total_spend,
  ntile(4) OVER (ORDER BY total_spend DESC, o_custkey) AS quartile
FROM spend
""",
)
def q_customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE ranking: customers into spend quartiles. The global-order
    window is the honest cost (one range-partitioned sort of the
    CUSTOMER-grain aggregate — small next to the fact scan); deterministic
    o_custkey tiebreak makes bucket edges stable."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        money_sum("o_totalprice").alias("total_spend")
    )
    w = Window.orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
    return spend.select(
        "o_custkey", "total_spend", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "events_hourly_window",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type, count(*) AS n,
  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
FROM events GROUP BY 1, 2, 3
""",
)
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation via Spark's native window() expression —
    the same operator Structured Streaming uses with a watermark, here in
    batch. One hash agg; window bounds come from the struct, no join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )


@register(
    "approx_users_sketch_rollup",
    oracle="""
SELECT count(DISTINCT user_id) AS exact_users, count(*) AS n_events,
  TRUE AS within_bound
FROM events
""",
)
def q_approx_users_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental distinct-count pattern end-to-end: per-day HLL
    sketch table (one fixed-width row per day — the MERGE-maintained
    increment) union-merged to a corpus-wide distinct-user estimate.
    Emitted as the deterministic contract (exact count + 5% error-bound
    boolean; HLL union is register-max, merge-order independent) so the
    driver can hash-check it; the pytest suite additionally asserts
    merge-invariance of the sketch table itself (operators/sketches.py)."""
    from ecommerce_data_pipeline_spark.operators.sketches import (
        daily_user_sketches,
        merge_sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    rolled = merge_sketches(daily_user_sketches(ev))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    return rolled.crossJoin(exact).select(
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_bound"),
    )


@register(
    "shipping_priority_top10",
    oracle="""
SELECT l_orderkey,
  sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
""",
)
def q_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter (mktsegment) broadcast
    into the orders join, both date predicates pushed to their scans, then
    revenue rollup + top-10 via TakeOrdered. The plan: filtered customer
    (small) broadcasts; orders joins then lineitem joins shuffle on the
    order key once; no global sort for the limit. Exact 1e-4-unit money."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        F.broadcast(customer)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_u) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "media_embedding_topk",
    oracle=f"""
WITH emb AS (
  -- outer comprehension variable is 'd': md5_long_sql's own inner
  -- comprehension binds 'i', which would shadow an outer 'i'.
  SELECT doc_id,
    [CAST(({md5_long_sql("text || ':' || CAST(d AS VARCHAR)")}) % 100000 AS DOUBLE)/100000.0
     for d in generate_series(0, 15)] AS e
  FROM documents
),
q AS (SELECT doc_id AS query_id, e AS qe FROM emb WHERE doc_id % 100 = 0),
scored AS (
  SELECT q.query_id, emb.doc_id AS neighbor_id,
    round(list_inner_product(qe, e)
          / (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))), 4)
      AS cosine_sim
  FROM q JOIN emb ON emb.doc_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3
""",
)
def q_media_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal training-data path end-to-end: binary payloads →
    Arrow-batched embed kernel (stub encoder, operators/multimodal.py) →
    exact cosine top-3 per query doc. Proves the binary→vector→ANN
    composition on real Spark plumbing; the oracle recomputes the
    deterministic embedding and ranking entirely in SQL."""
    from ecommerce_data_pipeline_spark.operators.multimodal import embed_media

    docs = load_table(spark, sf_dir, "documents")
    emb = embed_media(attach_binary_payload(docs))
    queries_df = emb.filter(F.col("doc_id") % 100 == 0)
    return sim.cosine_topk(
        emb, queries_df, k=3, id_col="doc_id", vec_col="embedding"
    )


@register(
    "shipment_status_current",
    oracle=f"""
WITH {PAY_SQL}
SELECT order_id,
  CASE WHEN fully_paid AND o_orderstatus = 'F' THEN 'DISPATCHED'
       WHEN fully_paid THEN 'READY_TO_SHIP'
       ELSE 'PENDING_PAYMENT' END AS state,
  CASE WHEN fully_paid AND o_orderstatus = 'F'
         THEN last_payment_ts + INTERVAL 1 HOUR
       WHEN fully_paid THEN last_payment_ts
       ELSE order_ts END AS state_ts,
  CAST(1 + CASE WHEN fully_paid THEN 1 ELSE 0 END
         + CASE WHEN fully_paid AND o_orderstatus = 'F' THEN 1 ELSE 0 END
       AS BIGINT) AS n_events
FROM enriched JOIN orders USING (o_orderkey)
""",
)
def q_shipment_status_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7's second machine: the 3-state shipment lifecycle
    (PENDING_PAYMENT → READY_TO_SHIP → DISPATCHED,
    services/shipping/app/kafka/consumer.py:100-141) as the same monotone
    fold. Shipment events derive deterministically from the medallion:
    every order opens PENDING_PAYMENT; full payment emits READY_TO_SHIP at
    the last payment; finished ('F') orders dispatch an hour later. One
    union + one hash agg — no sequential replay."""
    from ecommerce_data_pipeline_spark.operators.state import (
        SHIPMENT_STATE_RANKS,
        fold_state_events,
    )

    orders_clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    payments_clean = parse_payments(
        kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
    )
    enriched = enrich_orders(orders_clean, payments_clean)
    status = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("order_id"), "o_orderstatus"
    )
    e = enriched.join(status, "order_id")
    pending = e.select(
        "order_id", F.lit("PENDING_PAYMENT").alias("state"),
        F.col("order_ts").alias("event_ts"),
    )
    ready = e.filter("fully_paid").select(
        "order_id", F.lit("READY_TO_SHIP").alias("state"),
        F.col("last_payment_ts").alias("event_ts"),
    )
    dispatched = e.filter(
        F.col("fully_paid") & (F.col("o_orderstatus") == "F")
    ).select(
        "order_id", F.lit("DISPATCHED").alias("state"),
        (F.col("last_payment_ts") + F.expr("INTERVAL 1 HOUR")).alias("event_ts"),
    )
    events = pending.unionByName(ready).unionByName(dispatched)
    return fold_state_events(events, ranks=SHIPMENT_STATE_RANKS)


@register(
    "quality_report",
    oracle=f"""
WITH {PAY_SQL},
fact AS (
  SELECT date_trunc('minute', o_orderdate) AS minute_bucket,
    {money_sum_sql('total_amount')} AS gmv,
    count(*) AS paid_orders
  FROM enriched WHERE fully_paid GROUP BY 1
),
s AS (
  SELECT
    sum(CASE WHEN minute_bucket IS NULL THEN 1 ELSE 0 END) AS nn_bucket,
    sum(CASE WHEN gmv IS NULL THEN 1 ELSE 0 END) AS nn_gmv,
    sum(CASE WHEN paid_orders IS NULL THEN 1 ELSE 0 END) AS nn_paid,
    count(*) - count(DISTINCT minute_bucket) AS dup_buckets,
    sum(CASE WHEN gmv < 0 THEN 1 ELSE 0 END) AS neg_gmv,
    sum(CASE WHEN paid_orders < 0 THEN 1 ELSE 0 END) AS neg_paid
  FROM fact
)
SELECT 'not_null:minute_bucket' AS check, CAST(nn_bucket AS BIGINT) AS failing_rows, nn_bucket = 0 AS passed FROM s
UNION ALL SELECT 'not_null:gmv', CAST(nn_gmv AS BIGINT), nn_gmv = 0 FROM s
UNION ALL SELECT 'not_null:paid_orders', CAST(nn_paid AS BIGINT), nn_paid = 0 FROM s
UNION ALL SELECT 'unique:minute_bucket', CAST(dup_buckets AS BIGINT), dup_buckets = 0 FROM s
UNION ALL SELECT 'non_negative:gmv', CAST(neg_gmv AS BIGINT), neg_gmv = 0 FROM s
UNION ALL SELECT 'non_negative:paid_orders', CAST(neg_paid AS BIGINT), neg_paid = 0 FROM s
""",
)
def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-build quality gate as a QUERY: the gold fact's full check
    suite (not_null ×3, unique minute_bucket, non_negative ×2 —
    schema.yml:4-20 parity) computed in ONE aggregate pass over the fact
    (conditional sums + count distinct), then unpivoted to a row per
    check. Contrast with quality.py's per-check actions: this is the
    report shape a scheduler would persist each run."""
    fact = QUERIES["fct_sales_minute"](spark, sf_dir)
    s = fact.agg(
        F.sum(F.when(F.col("minute_bucket").isNull(), 1).otherwise(0)).alias("nn_bucket"),
        F.sum(F.when(F.col("gmv").isNull(), 1).otherwise(0)).alias("nn_gmv"),
        F.sum(F.when(F.col("paid_orders").isNull(), 1).otherwise(0)).alias("nn_paid"),
        (F.count(F.lit(1)) - F.countDistinct("minute_bucket")).alias("dup_buckets"),
        F.sum(F.when(F.col("gmv") < 0, 1).otherwise(0)).alias("neg_gmv"),
        F.sum(F.when(F.col("paid_orders") < 0, 1).otherwise(0)).alias("neg_paid"),
    )
    checks = [
        ("not_null:minute_bucket", "nn_bucket"),
        ("not_null:gmv", "nn_gmv"),
        ("not_null:paid_orders", "nn_paid"),
        ("unique:minute_bucket", "dup_buckets"),
        ("non_negative:gmv", "neg_gmv"),
        ("non_negative:paid_orders", "neg_paid"),
    ]
    # Unpivot via explode of a struct array — a UNION of per-check selects
    # would re-evaluate the fact-building lineage once per branch.
    packed = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("check"),
                    F.col(c).cast("long").alias("failing_rows"),
                    (F.col(c) == 0).alias("passed"),
                )
                for name, c in checks
            ]
        )
    ).alias("r")
    return s.select(packed).select("r.check", "r.failing_rows", "r.passed")


@register(
    "sales_cube",
    oracle="""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
  coalesce(o_orderstatus, 'ALL') AS status,
  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue,
  count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
)
def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all four grouping combinations of (priority, status) in one
    Expand + one hash aggregate — completes the grouping-construct family
    next to revenue_rollup's ROLLUP. 2^n expansion is the honest cost of
    CUBE; keep n small by design."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "above_avg_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (
  SELECT 1.5 * avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
)
""",
)
def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface: orders 50%
    above their customer's average. Catalyst de-correlates it into an
    aggregate + equi-join (no per-row subquery execution) — assert-able in
    the plan, and the idiomatic rewrite at any scale."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM __orders_sq o
        WHERE o_totalprice > (
          SELECT 1.5 * avg(i.o_totalprice)
          FROM __orders_sq i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "payment_reconciliation",
    oracle=f"""
WITH {PAY_SQL},
o AS (SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
             CAST(round(round(o_totalprice, 2)*100) AS BIGINT) AS total_c
      FROM orders),
pp AS (SELECT CAST(order_key AS VARCHAR) AS order_id, count(*) AS n_legs,
              sum(amount_cents) AS paid_c
       FROM pay GROUP BY 1),
j AS (SELECT order_id, total_c, coalesce(n_legs, 0) AS n_legs,
             coalesce(paid_c, 0) AS paid_c, o.order_id IS NULL AS orphan
      FROM o FULL JOIN pp USING (order_id))
SELECT order_id,
  CASE WHEN orphan THEN 'orphan_payment'
       WHEN paid_c = 0 THEN 'unpaid'
       WHEN paid_c < total_c THEN 'partial'
       WHEN paid_c = total_c THEN 'exact'
       ELSE 'overpaid' END AS status,
  n_legs,
  CAST(CASE WHEN orphan THEN paid_c
            WHEN paid_c = 0 THEN -total_c
            ELSE paid_c - total_c END AS DOUBLE)/100.0 AS delta
FROM j
""",
)
def q_payment_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order ledger reconciliation: full-outer join of orders against
    the payment-leg rollup, residue classified (unpaid/partial/exact/
    overpaid) INCLUDING the orphan payments the enrich join drops.
    Cents-exact integer deltas. All built-ins — order_id-grain groups are
    far too small for per-group Python; the cogroup-API twin
    (service.reconcile_orders_payments, identical semantics,
    equality-tested in tests/) exists for ledger-walk kernels SQL cannot
    express."""
    orders_clean = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
    )
    payments_clean = parse_payments(
        kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
    )
    o = orders_clean.select(
        "order_id", F.round(F.col("total_amount") * 100).cast("long").alias("total_c")
    )
    pp = payments_clean.groupBy("order_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.sum(F.round(F.col("amount") * 100).cast("long")).alias("paid_c"),
    )
    j = (
        o.join(pp, "order_id", "full_outer")
        .select(
            "order_id",
            "total_c",
            F.coalesce("n_legs", F.lit(0)).alias("n_legs"),
            F.coalesce("paid_c", F.lit(0)).alias("paid_c"),
            F.col("total_c").isNull().alias("orphan"),
        )
    )
    status = (
        F.when(F.col("orphan"), "orphan_payment")
        .when(F.col("paid_c") == 0, "unpaid")
        .when(F.col("paid_c") < F.col("total_c"), "partial")
        .when(F.col("paid_c") == F.col("total_c"), "exact")
        .otherwise("overpaid")
    )
    delta_c = (
        F.when(F.col("orphan"), F.col("paid_c"))
        .when(F.col("paid_c") == 0, -F.col("total_c"))
        .otherwise(F.col("paid_c") - F.col("total_c"))
    )
    return j.select(
        "order_id",
        status.alias("status"),
        "n_legs",
        (delta_c.cast("double") / 100.0).alias("delta"),
    )


@register("ann_recall_report")  # compares two engine paths: rows-only check
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measuring ANN quality: recall@5 of the k-means IVF multi-probe
    search (8 cells, nprobe=3 — the real quantizer, operators/quantize.py)
    against the exact brute-force top-5, per query — the number a 100 TB
    deployment watches when it trades scan cost for recall. Both paths run
    in-engine; one semi join + one agg compares them. Engine-vs-engine
    metric (no external truth) → rows-only driver check; determinism
    pinned by the same tiebreaks as the underlying operators."""
    from ecommerce_data_pipeline_spark.operators.quantize import (
        kmeans_fit,
        multiprobe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(emb, queries_df, k=5).select(
        "query_id", "neighbor_id"
    )
    centroids = kmeans_fit(emb, k=8, iters=3)
    approx = multiprobe_topk(emb, queries_df, centroids, k=5, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall_at_5"),
        )
    )
