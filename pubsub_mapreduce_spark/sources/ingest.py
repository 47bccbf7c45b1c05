"""JSONL ingestion with poison-record quarantine.

The reference parses every Pub/Sub payload dynamically and ACKs even
when the parse panics (knobs.go:85-90 — C1 in SURVEY §2.5): poison
messages are dropped-but-acknowledged so the stream never stalls. The
file-ingest analogue: every line is read as text and parsed with
PERMISSIVE ``from_json`` carrying an explicit corrupt-record field —
malformed lines land in a quarantine relation with their raw text
instead of failing the job (FAILFAST) or silently vanishing
(DROPMALFORMED). At 100TB a crawled corpus WILL contain malformed
lines, and dropping them without accounting is an audit hole — the
quarantine side is a first-class output, not an error path.

text + ``from_json`` rather than ``spark.read.json``'s built-in
PERMISSIVE mode for two reasons: (1) it is the exact shape of the
reference's consume path (raw message -> per-record JSON parse,
knobs.go:93-100 / codec F3), shared by the streaming form over the same
directory; (2) the raw datasource forbids queries that touch only the
corrupt column (SPARK-21610 / QUERY_ONLY_CORRUPT_RECORD_COLUMN), which
is precisely what a quarantine count does — parsing explicitly has no
such restriction. Parsing is map-only and codegen'd; both split sides
stay lazy over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _parse(raw: DataFrame, schema: str) -> DataFrame:
    parsed = F.from_json(
        F.col("value"),
        f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return (
        raw.where(F.trim("value") != "")  # the json source skips blanks; so do we
        .select(parsed.alias("r"))
        .select("r.*")
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Batch-read newline-delimited JSON under an explicit schema.

    Returns ALL lines: well-formed rows with ``_corrupt_record`` null,
    poison lines with their raw text preserved there (and typed columns
    null). Explicit schema, never inference — inference is an extra full
    scan AND a correctness hazard (a corpus whose first N lines miss an
    optional field would drop it for everyone). Split with
    :func:`split_quarantine`.

    A type-mismatched FIELD (e.g. ``"n": "abc"`` against a long column)
    quarantines the whole line — matching the reference, where a
    wrong-typed field panics the callback and poisons the whole message
    (knobs.go:98-100), not just the field. A MISSING field is legal JSON
    and parses to null (struct zero-value semantics, flood.go:68-72)."""
    return _parse(spark.read.text(path), schema)


def read_jsonl_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Streaming form of :func:`read_jsonl` — same schema contract, same
    quarantine semantics, over a growing directory."""
    return _parse(spark.readStream.text(path), schema)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows typed with the corrupt column
    dropped; quarantined rows keep every column (typed columns null)
    plus the raw line, so the audit side can be replayed after a parser
    fix. Two lazy filters over one scan."""
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def observed_quarantine(df: DataFrame):
    """(df, observation): the ingest audit counters attached via the
    Observation API — they materialize as a side effect of whatever
    action the CALLER runs (the write itself), so the audit costs ZERO
    extra scans. ``quarantine_stats`` is the standalone second-pass
    form; this is what a production ingest job actually wires, because
    at 100TB a second accounting scan is a second 100TB read.

    Usage::

        parsed, obs = observed_quarantine(read_jsonl(spark, path, schema))
        parsed.where(...).write.parquet(out)   # the real job
        obs.get  # {'n_lines': ..., 'n_parsed': ..., 'n_quarantined': ...}
    """
    from pyspark.sql import Observation

    obs = Observation("ingest_audit")
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col(CORRUPT_COL).isNull(), 1)).alias("n_parsed"),
            F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
        ),
        obs,
    )


def quarantine_stats(df: DataFrame) -> DataFrame:
    """One-row ingest audit: total / parsed / quarantined counts — the
    number a pipeline alerts on when a crawler starts emitting garbage.
    Single partial-agg'd scan."""
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col(CORRUPT_COL).isNull(), 1)).alias("n_parsed"),
        F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
    )


def read_csv(
    spark: SparkSession, path: str, schema: str, sep: str = ","
) -> DataFrame:
    """CSV with the SAME quarantine contract as :func:`read_jsonl`:
    explicit schema (never inference), PERMISSIVE parse via
    ``from_csv`` over a raw text scan, malformed lines preserved whole
    in ``_corrupt_record`` — completing the format matrix
    (parquet / jsonl / csv / kafka / rate) under one poison-line
    policy. Header rows, if any, quarantine themselves (a header never
    type-checks against the data schema), which doubles as the audit
    trail that one was present.

    Same rationale as the JSONL form for going through text +
    ``from_csv`` instead of ``spark.read.csv``: identical batch and
    streaming shape, and no QUERY_ONLY_CORRUPT_RECORD_COLUMN
    restriction on the quarantine count."""
    parsed = F.from_csv(
        F.col("value"),
        f"{schema}, {CORRUPT_COL} string",
        {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": CORRUPT_COL,
            "sep": sep,
        },
    )
    return (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .select(parsed.alias("r"))
        .select("r.*")
    )


def read_csv_stream(
    spark: SparkSession, path: str, schema: str, sep: str = ","
) -> DataFrame:
    """Streaming form of :func:`read_csv` — same schema contract, same
    quarantine semantics, over a growing directory."""
    parsed = F.from_csv(
        F.col("value"),
        f"{schema}, {CORRUPT_COL} string",
        {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": CORRUPT_COL,
            "sep": sep,
        },
    )
    return (
        spark.readStream.text(path)
        .where(F.trim("value") != "")
        .select(parsed.alias("r"))
        .select("r.*")
    )
