"""Fixture readers.

The driver fixtures are one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/`` (see TESTDATA.md / FIXTURES.md).
At 100TB these would be partitioned parquet/iceberg datasets; the reader
API is the same ``spark.read.parquet`` either way — column pruning and
predicate pushdown reach the scan automatically when callers select/filter
on the returned DataFrames (verify via ``plans.explain_str``).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Lazy-DataFrame cache keyed by live session. ``spark.read.parquet`` does
# a synchronous footer/schema read on the driver (~90ms/table, ~0.9s for
# the full star schema) — a long-running engine resolves table metadata
# ONCE via its catalog, not per query, so re-reading footers on every
# queries() call both misbenchmarks the plans and mismodels production.
# DataFrames are immutable lazy plans: sharing one per (sf_dir, table) is
# exactly `spark.table(...)` semantics. WeakKey so stopped sessions drop
# their entries.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (cached lazy scan — see _TABLE_CACHE).
    Filters/projections applied by the caller are pushed into the parquet
    reader by Catalyst.

    The events ts column is normalized to session-tz TimestampType
    regardless of how the fixture encodes it: TIMESTAMP(NANOS) +
    ``nanosAsLong`` arrives as long nanoseconds (integer ns->us division,
    truncation — identical to DuckDB's read of the same file);
    TIMESTAMP(MICROS) without tz arrives as TIMESTAMP_NTZ, which the UTC
    session casts to TIMESTAMP_LTZ value-identically. Downstream
    operators rely on LTZ (e.g. RANGE frames over ``ts.cast('double')``
    — NTZ has no epoch, so Spark forbids that cast)."""
    if spark not in _TABLE_CACHE:
        # First touch of a session — including a FOREIGN session the
        # driver hands to entry()/queries(): pin the two runtime confs
        # the engine's timestamp semantics depend on. UTC makes NTZ->LTZ
        # casts value-identical and epoch math agree with the TZ-naive
        # DuckDB oracle; nanosAsLong covers TIMESTAMP(NANOS) fixture
        # generations (harmless on MICROS ones).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache = _TABLE_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    if key not in cache:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, LongType):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(ts_type, TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        cache[key] = df
    return cache[key]


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Optionally repartition a too-narrow scan before genuinely heavy
    per-row work (e.g. a REAL image decode at seconds-per-row).

    Parquet splits only at row-group boundaries, so a small single-file
    scan arrives as ONE partition. Measured trade-off on the fixtures:
    widening speeds the map work itself 6x (shingle explode 3.4s -> 0.6s)
    but SLOWS complete pipelines — a following high-cardinality groupBy
    then builds partial-aggregate state in every partition and shuffles
    32x the partial rows, and Pandas-UDF stages pay 32 Python-worker
    spin-ups for millisecond batches. Operators therefore do NOT call
    this by default; use it only when downstream per-row cost dwarfs
    those overheads. At 100TB scans already carry >= cores partitions
    and this is a no-op either way."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a dict of lazy DataFrames."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join/agg
    keys. Two tables bucketed the same way join with ZERO shuffle — the
    scan itself is the partitioning — which at 100TB turns the biggest
    fact-fact join (e.g. lineitem ⨝ orders on orderkey) from a full
    two-sided exchange into a co-located merge. Bucket count should be
    sized so one bucket of the larger table fits an executor's memory
    (tests assert the no-Exchange plan property, not a magic number)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist; clear both so overwrite is reliable
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 5_000_000,
) -> None:
    """Persist a dataset hive-partitioned by low-cardinality filter
    columns (the lake layout the 100TB deployment would use). A reader
    filtering on a partition column never opens non-matching directories
    — the filter resolves at FILE LISTING time (PartitionFilters in the
    scan node), before any IO, unlike row-group predicate pushdown which
    still reads footers.

    Choose partition columns with few distinct values (date, source,
    event_type): high-cardinality partitioning makes a small-files
    problem that slows listing more than pruning saves.
    ``maxRecordsPerFile`` bounds the large-partition case so single
    partitions split across parallel tasks on read."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def zorder_key(a, b, bits: int = 16):
    """Morton/Z-order interleave of the low ``bits`` bits of two
    non-negative integer columns — the multi-dimensional clustering key
    behind Delta/Iceberg OPTIMIZE ZORDER. Sorting a table by this key
    makes rows close in BOTH dimensions land in the same files, so
    parquet row-group min/max stats prune scans filtered on EITHER
    column (a single-column sort only prunes its own column).

    A static 2x``bits``-term expression tree of shift/and/or — fully
    codegen'd (unlike per-element HOFs, constant-size bit circuits stay
    JVM-compiled), ANSI-overflow-free (result < 2^(2*bits) <= 2^32).
    Mirrored bit-for-bit by the oracle SQL (same operators in DuckDB).
    """
    ac = (a if not isinstance(a, str) else F.col(a)).cast("long")
    bc = (b if not isinstance(b, str) else F.col(b)).cast("long")
    # bit positions never overlap, so '+' IS the bitwise-or here
    # (PySpark's Column '|' is boolean, not bitwise)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(ac, i) % 2, 2 * i)
        z = z + F.shiftleft(F.shiftright(bc, i) % 2, 2 * i + 1)
    return z


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The DuckDB twin of :func:`zorder_key` as a SQL expression string
    (same shift/mod-2 bit circuit; '%' and '<<'/'>>' agree across
    engines for non-negative operands)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) % 2) << {2 * i})")
        terms.append(f"((({b} >> {i}) % 2) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, a: str, b: str, n_files: int = 8) -> None:
    """Persist z-order-clustered on (a, b): range-partition by the
    Morton key (global order across files) and sort within partitions,
    so every file covers a tight rectangle of the (a, b) space and
    row-group stats prune filters on either column. The write-side
    shuffle (one range exchange) is paid once; every selective reader
    saves IO forever after — the standard layout trade at 100TB."""
    z = zorder_key(a, b)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent table checksum — the anti-entropy primitive of
    every migration/replication/backfill: one (n_rows, checksum) row
    per table; two copies agree iff the numbers agree, regardless of
    partitioning, row order, or engine.

    checksum = SUM over rows of int32(md5(canonical row string)) —
    addition is commutative/associative, so the result is partition-
    and order-invariant (unlike any positional hash), and the md5-int
    trick is the repo's standard cross-engine hash (DuckDB twin:
    ``sum(('0x' || substr(md5(...), 1, 8))::BIGINT)``). One partial-
    agg'd scan; the canonical string is ``concat_ws('|', cols)`` —
    restrict ``cols`` to types whose string form is engine-identical
    (ints, strings; NOT doubles near the 1e7 scientific-notation
    boundary or fractional timestamps)."""
    canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 8), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(h).alias("checksum")
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Backfill primitive: dynamic partition overwrite — replace ONLY the
    partitions present in ``df``, leaving every other partition's files
    untouched. This is how a 100TB lake corrects one bad day: rewrite
    that day's directory, never the table. Static overwrite (the
    default) would truncate the whole dataset first; the per-write
    ``partitionOverwriteMode=dynamic`` option scopes the safe behavior
    to this write without mutating session config."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
