"""Pipe-delimited ``.tbl`` interchange — TPC-H dbgen's native format.

Relational benchmark data ships as headerless pipe-delimited text (dbgen
emits ``orders.tbl`` etc.), and plenty of warehouse landing zones still
speak delimited text; an engine claiming drop-in coverage must ingest it
with the same discipline as the JSONL corpus path (sources/corpus_io.py):
schema PINNED (no inferSchema scan), PERMISSIVE parse, malformed lines
quarantined instead of failing the job.

Wire-format contract (round 11 — pinned explicitly on both directions):

- Timestamps travel as ``yyyy-MM-dd HH:mm:ss`` — the fixture's
  timestamps are second-aligned, and the certified round-trip query
  (``orders_tbl_roundtrip``) would hash-mismatch its parquet oracle if
  the format ever lost a component.
- NULL travels as ``\\N`` (the MySQL/Hive convention) and empty string
  as a quoted ``""`` — with both representations pinned, null vs
  empty-string round-trips losslessly (Spark's CSV defaults collapse
  both to null on read). Constraint: a GENUINE data value ``\\N`` is
  indistinguishable from null on the wire — out of contract (dbgen data
  never contains it).
- Leading/trailing whitespace is preserved: the writer pins
  ``ignoreLeading/TrailingWhiteSpace=false`` (Spark's CSV writer trims
  by default; its reader does not — an asymmetry that silently mutates
  padded strings).
- **dbgen's trailing delimiter**: genuine dbgen output terminates EVERY
  line with the field separator (``1|alpha|1.5|``). A schema-pinned
  reader sees that as one extra column and quarantines the whole file —
  pass ``dbgen_trailing_delimiter=True`` to parse the trailing empty
  token (and require it to be empty: a line with junk after the final
  pipe still quarantines). ``write_tbl(trailing_delimiter=True)`` emits
  the canonical dbgen shape (this mode writes empty strings unquoted,
  so null/empty distinction is out of contract there — dbgen data has
  neither).
- Embedded newlines: ``.tbl`` is a line-oriented format; dbgen data
  never embeds newlines. The writer quotes them (valid CSV), but the
  default line-splittable reader would mis-split such rows — pass
  ``multiline_strings=True`` to parse quoted multi-line records
  correctly. That mode reads each FILE as one unsplittable unit
  (Spark's multiLine contract), so it is for modest landing files, not
  a 100 TB scan; it also requires an explicit ``storage_level`` because
  the pay-per-use quarantine reparse is line-oriented.

Storage discipline matches corpus_io (round 11): NO caching by default;
``quarantine`` re-derives corrupt lines from a text scan + ``from_csv``
reparse only if consumed. Pass ``storage_level`` (+ ``return_raw=True``
for an unpersist handle) to share one persisted parse across both splits.

Projection-independence (round 12): the line-oriented paths parse via a
``from_csv`` of the FULL struct over a text scan, never the native csv
reader's per-file malformed handling — the native reader detects
malformedness AFTER column pruning, so a row broken only in an
unprojected column survives ``select("id")`` but vanishes from a full-row
read (the same DataFrame yielding different row sets per projection).
``from_csv`` with non-empty options is exempt from schema pruning, so the
good/quarantine split is decided once, on the whole row, for every
downstream projection; quarantine always carries the true raw line.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"
NULL_TOKEN = "\\N"
_CORRUPT = "_corrupt_record"
_TRAILING = "_trailing"


def write_tbl(
    df: DataFrame,
    path: str,
    n_shards: int = 32,
    trailing_delimiter: bool = False,
) -> None:
    """Write ``df`` as ``n_shards`` headerless pipe-delimited files.

    NULL is written as ``\\N`` so the reader can distinguish it from an
    empty string (which Spark writes quoted, ``""``). Whitespace
    preservation is pinned explicitly: Spark's CSV WRITER trims
    leading/trailing whitespace by default (the reader does not), which
    would silently mutate padded strings in transit.
    ``trailing_delimiter=True`` emits dbgen's canonical line shape
    (every line ends with ``|``; empty strings write unquoted in this
    mode — see the module docstring contract)."""
    out = df
    writer_extra = {}
    if trailing_delimiter:
        out = df.withColumn(_TRAILING, F.lit(""))
        # Unquoted empty for the trailing token → a bare terminal pipe,
        # byte-identical to dbgen output.
        writer_extra["emptyValue"] = ""
    (
        out.repartition(n_shards)
        .write.mode("overwrite")
        .option("sep", "|")
        .option("header", "false")
        .option("timestampFormat", TS_FORMAT)
        .option("nullValue", NULL_TOKEN)
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .options(**writer_extra)
        .csv(path)
    )


def read_tbl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    storage_level: StorageLevel | None = None,
    return_raw: bool = False,
    multiline_strings: bool = False,
    dbgen_trailing_delimiter: bool = False,
):
    """(good, quarantine): schema-pinned pipe-delimited read.

    Same contract as read_corpus_jsonl — PERMISSIVE + corrupt-record
    capture, good carries exactly ``schema``'s columns, NO caching by
    default (quarantine is a pay-per-use text-scan reparse; see the
    module docstring for null/empty/newline/trailing-delimiter wire
    rules and the ``multiline_strings`` constraints)."""
    if multiline_strings and storage_level is None:
        raise ValueError(
            "multiline_strings=True requires an explicit storage_level: "
            "the uncached quarantine path reparses per text LINE, which "
            "is wrong for quoted multi-line records"
        )
    parse_fields = list(schema.fields)
    if dbgen_trailing_delimiter:
        parse_fields.append(StructField(_TRAILING, StringType()))
    full = StructType(parse_fields + [StructField(_CORRUPT, StringType())])
    base_opts = {
        "sep": "|",
        "header": "false",
        "timestampFormat": TS_FORMAT,
        "nullValue": NULL_TOKEN,
        "emptyValue": "",
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
    }
    opts = dict(
        base_opts, mode="PERMISSIVE", columnNameOfCorruptRecord=_CORRUPT
    )
    # In dbgen mode a well-formed line parses the terminal empty token
    # into _trailing as ""; anything non-empty after the final pipe is a
    # malformed line and must quarantine, not silently drop data.
    if multiline_strings:
        # Whole-file records (quoted embedded newlines): the ONLY mode
        # that cannot reparse per text line, so it stays on the native
        # multiLine csv reader, persisted (enforced above) — the persist
        # materializes the FULL schema, so corrupt detection is
        # projection-independent here too. Quarantine carries the corrupt
        # record when the parser captured one; a trailing-junk-only row
        # (dbgen mode) parsed fine, so no raw record exists — it
        # quarantines as the documented placeholder.
        trailing_ok = (
            (F.col(_TRAILING).isNull() | (F.col(_TRAILING) == ""))
            if dbgen_trailing_delimiter
            else F.lit(True)
        )
        raw = (
            spark.read.schema(full)
            .options(**opts)
            .option("multiLine", "true")
            .csv(path)
            .persist(storage_level)
        )
        good = raw.filter(F.col(_CORRUPT).isNull() & trailing_ok).select(
            *[f.name for f in schema.fields]
        )
        quarantine = raw.filter(
            F.col(_CORRUPT).isNotNull() | ~trailing_ok
        ).select(
            F.coalesce(F.col(_CORRUPT), F.lit("<junk-after-trailing-|>"))
            .alias("raw_line")
        )
    else:
        # Line-oriented (default): text scan + from_csv reparse of the
        # FULL struct. The native reader's DROPMALFORMED/PERMISSIVE
        # detection runs AFTER column pruning — a row malformed only in
        # an unprojected column silently survives narrow projections, so
        # the same DataFrame yields different row sets per projection.
        # A from_csv expression with non-empty options is never
        # schema-pruned (OptimizeCsvJsonExprs requires empty options), so
        # row membership is decided on the full struct regardless of what
        # the caller selects. Bonus: quarantine always carries the TRUE
        # raw line (the native path only has it for corrupt rows).
        # Truly-empty lines are excluded to match the native csv reader,
        # which skips blank lines.
        schema_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in full.fields
        )
        parsed = F.from_csv(F.col("value"), F.lit(schema_ddl), opts)
        raw = (
            spark.read.text(path)
            .filter(F.length(F.col("value")) > 0)
            .select(F.col("value"), parsed.alias("_parsed"))
        )
        if storage_level is not None:
            # One persisted (line, parsed-struct) frame serves both
            # splits — parse cost paid once, raw lines retained.
            raw = raw.persist(storage_level)
        p = F.col("_parsed")
        bad = p.isNull() | p[_CORRUPT].isNotNull()
        if dbgen_trailing_delimiter:
            bad = bad | (p[_TRAILING].isNotNull() & (p[_TRAILING] != ""))
        good = raw.filter(~bad).select(
            *[p[f.name].alias(f.name) for f in schema.fields]
        )
        quarantine = raw.filter(bad).select(F.col("value").alias("raw_line"))
    if return_raw:
        return good, quarantine, raw
    return good, quarantine
