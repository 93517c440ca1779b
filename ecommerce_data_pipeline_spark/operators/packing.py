"""Training-sequence assembly: concat-then-chunk sequence packing and
RAG-style overlapping chunking (engine extension — LLM-pipeline surface
alongside dedup/curate/text; no reference twin, the reference has no
training-data layer).

Both operators are pure built-in expressions (split/size/window-sum/
sequence/explode/slice) — whole-stage codegen, no Python in the hot path —
and both are oracle-checked against DuckDB twins.

Scale notes (100 TB):
- ``pack_sequences`` needs a running token offset, i.e. a window sum. A
  GLOBAL ordering would serialize onto one reducer, so packing is sharded:
  documents land in ``n_shards`` deterministic shards and the cumsum runs
  per shard — one shuffle, each shard an independent window, shard count
  sized to the cluster (each training shard is packed independently anyway,
  matching how pretraining data is actually laid out).
- ``chunk_documents`` is embarrassingly parallel: explode over per-doc
  chunk starts, fan-out bounded by ceil(n_tokens/stride).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens, empty-dropped — the repo's established
    cross-engine tokenizer (operators/text.py token_stats):
    ``list_filter(string_split(text, ' '), w -> w <> '')`` in DuckDB."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk packing: within each shard, documents are laid
    end-to-end in ``id_col`` order and the token stream is cut into
    fixed-``budget`` training sequences — the standard pretraining layout
    (documents may straddle a sequence boundary).

    Sharding is ``id % n_shards`` for oracle determinism (production would
    hash the id; same plan shape). Zero-token docs are dropped — they
    occupy no positions.

    Output per doc: (doc_id, shard, n_tokens, start_seq, start_offset,
    end_seq) where start_seq/end_seq are the first/last sequence index the
    doc touches within its shard and start_offset its position inside
    start_seq.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % F.lit(int(n_shards))).cast("int").alias("shard"),
        F.size(_ws_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    b = int(budget)
    cum = F.sum("n_tokens").over(w)
    start_off = (cum - F.col("n_tokens")).alias("__so")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        start_off,
        cum.alias("__cum"),
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("__so") / b).cast("long").alias("start_seq"),
        (F.col("__so") % b).cast("long").alias("start_offset"),
        F.floor((F.col("__cum") - 1) / b).cast("long").alias("end_seq"),
    )


def pack_sequences_sql(budget: int = 512, n_shards: int = 32) -> str:
    """DuckDB twin of :func:`pack_sequences` over the ``documents`` view."""
    return f"""
WITH d AS (
  SELECT doc_id, CAST(doc_id % {n_shards} AS INTEGER) AS shard,
    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
      AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM d WHERE n_tokens > 0
)
SELECT doc_id, shard, n_tokens,
  CAST((cum - n_tokens) // {budget} AS BIGINT) AS start_seq,
  CAST((cum - n_tokens) % {budget} AS BIGINT) AS start_offset,
  CAST((cum - 1) // {budget} AS BIGINT) AS end_seq
FROM c
"""


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-size chunking (the RAG/embedding-index shape):
    chunk starts at token offsets 0, stride, 2*stride, ... with
    ``stride = chunk_tokens - overlap``; the tail chunk may be short.
    Zero-token docs emit no chunks.

    Output: (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    stride = int(chunk_tokens) - int(overlap)
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _ws_tokens(F.col(text_col)).alias("__toks"),
    ).withColumn("__n", F.size("__toks").cast("long"))
    chunks = toks.filter(F.col("__n") > 0).select(
        "doc_id",
        "__toks",
        "__n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("__n") - 1, F.lit(stride))
        ).alias("start_token"),
    )
    return chunks.select(
        "doc_id",
        F.floor(F.col("start_token") / stride).cast("long").alias("chunk_id"),
        "start_token",
        F.least(F.lit(int(chunk_tokens)), F.col("__n") - F.col("start_token"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(
                F.col("__toks"),
                (F.col("start_token") + 1).cast("int"),
                int(chunk_tokens),
            ),
            " ",
        ).alias("chunk_text"),
    )


def chunk_documents_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """DuckDB twin of :func:`chunk_documents` over the ``documents`` view."""
    stride = int(chunk_tokens) - int(overlap)
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
), n AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
  FROM t WHERE len(toks) > 0
), s AS (
  SELECT doc_id, toks, n_tokens,
    unnest(generate_series(0, n_tokens - 1, {stride})) AS start_token
  FROM n
)
SELECT doc_id,
  CAST(start_token // {stride} AS BIGINT) AS chunk_id,
  CAST(start_token AS BIGINT) AS start_token,
  CAST(least({chunk_tokens}, n_tokens - start_token) AS BIGINT)
    AS n_chunk_tokens,
  array_to_string(
    list_slice(toks, start_token + 1, start_token + {chunk_tokens}), ' ')
    AS chunk_text
FROM s
"""
