"""JSONL corpus interchange: sharded writer + schema-enforced reader.

JSON-lines is the de-facto interchange format for LLM training corpora
(one document object per line, gzip-sharded in the wild — C4, The Pile,
RedPajama, Dolma all ship this shape), so an engine that curates training
data must read and write it losslessly, not just parquet. Spark's native
json source does the heavy lifting; this module pins the contract:

- **Writer**: explicit shard count (one task → one ``part-*.json`` file,
  the unit downstream loaders parallelize over), optional gzip codec.
- **Reader**: explicit schema (NEVER inferSchema on a 100 TB corpus — a
  schema-inference pass is a full extra scan), PERMISSIVE mode with a
  ``_corrupt_record`` column so malformed lines quarantine instead of
  killing the job (the same quarantine discipline as events_quarantine).

Storage discipline (round 11): the reader NEVER caches by default. The
round-10 version cached the full parsed corpus unconditionally — at the
100 TB target that churns the block manager / spills ~the whole input to
local executor disk even when the caller consumes only ``good``. Now:

- default (``storage_level=None``): one text scan + a ``from_json``
  reparse of the FULL document struct decides the good/quarantine split.
  Round 12 moved ``good`` off the native json scan: the native reader
  runs malformed-detection AFTER column pruning, so a row broken only in
  an unprojected field survives narrow projections while vanishing from
  full-row reads — projection-dependent row sets. ``from_json`` with
  non-empty options is never schema-pruned, so membership is decided on
  the whole document for every projection; the reparse mirrors the
  native reader's semantics otherwise, including skipping
  whitespace-only lines, which the json source silently drops.
- explicit ``storage_level`` (e.g. ``StorageLevel.DISK_ONLY``): one
  shared parse persisted at that level, both splits served from it —
  the right call when BOTH splits get fully consumed and fit the
  declared tier. Pass ``return_raw=True`` to also receive the persisted
  frame so you can ``raw.unpersist()`` when done (otherwise the cached
  blocks outlive the read — a leak across a long session).

Reference analogue: the consumers' JSON envelope contract
(docs/events.md:5-12) — tolerate-and-quarantine, never crash on a bad
payload.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def write_corpus_jsonl(
    df: DataFrame, path: str, n_shards: int = 32, compression: str | None = None
) -> None:
    """Write ``df`` as ``n_shards`` JSON-lines files (optionally gzipped).

    Round-robin repartition so shards are size-balanced regardless of the
    upstream partitioning — shard count, not input layout, is the knob a
    downstream loader's parallelism keys off.
    """
    writer = df.repartition(n_shards).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(schema.fields + [StructField(_CORRUPT, StringType())])


def read_corpus_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_JSONL_SCHEMA,
    storage_level: StorageLevel | None = None,
    return_raw: bool = False,
):
    """(good, quarantine): schema-enforced JSONL read with corrupt-line
    capture. ``good`` carries exactly ``schema``'s columns; ``quarantine``
    is (raw_line) for every unparseable input line.

    PERMISSIVE + columnNameOfCorruptRecord is the scale-safe posture: one
    syntactically broken line in shard 48k of a crawl dump must cost one
    quarantine row, not the job. See the module docstring for the
    ``storage_level`` / ``return_raw`` storage contract (default: NO
    caching; quarantine is a pay-per-use text-scan reparse).
    """
    full = _with_corrupt(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    # Both modes parse via a from_json of the FULL struct over a text scan
    # (round 12): the native json reader detects malformedness AFTER column
    # pruning, so a row broken only in an unprojected field (e.g. a string
    # where n_chars should be a long) survives ``select("doc_id")`` but
    # vanishes from a full-row read — the same DataFrame yielding different
    # row sets per projection. A from_json expression with non-empty
    # options is exempt from schema pruning (OptimizeJsonExprs requires
    # empty options), so the good/quarantine split is decided once, on the
    # whole document, for every downstream projection. Whitespace-only
    # lines are excluded to match the native json reader, which silently
    # skips them.
    parsed = F.from_json(F.col("value"), full, opts)
    raw = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .select(F.col("value"), parsed.alias("_parsed"))
    )
    if storage_level is not None:
        # One persisted (line, parsed-struct) frame serves both splits —
        # parse cost paid once, raw lines retained for quarantine.
        raw = raw.persist(storage_level)
    p = F.col("_parsed")
    bad = p.isNull() | p[_CORRUPT].isNotNull()
    good = raw.filter(~bad).select(
        *[p[f.name].alias(f.name) for f in schema.fields]
    )
    quarantine = raw.filter(bad).select(F.col("value").alias("raw_line"))
    if return_raw:
        return good, quarantine, raw
    return good, quarantine
