"""Distributed global order statistics — rank / ntile / prefix
aggregates over a TOTAL ordering without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic Spark
scale trap: Catalyst plans it as ``Exchange SinglePartition`` + one
sort task, so a window over a relation that grows with the data pushes
every row through ONE task (VERDICT r7: at 100x the sf0.1 fixtures
that is ~10^8 rows). The reference has no ranking surface at all
(SURVEY.md section 2.6) — this module exists so the relational layer's
inequality/segmentation queries (spend_gini, rfm_segments, abc_parts,
lorenz_deciles, skyline) scale like a sort, not like a funnel.

The two-pass range-partitioned form (the Teradata/BigQuery "global
rank" recipe, same decomposition Spark itself uses for ``orderBy``):

1. ``repartitionByRange(P, *order)`` — range-partition on the sort
   key, so partition i holds a contiguous key range and every key
   ordered before partition i's range lives in partitions < i. Rows
   with EQUAL keys land in one partition (boundaries are key values),
   and all call sites order by a key made unique with a tiebreak
   column, so the global order is total and boundary placement cannot
   change any output value (only which partition computes it).
2. ``localCheckpoint(eager=False)`` the staged relation — the
   per-partition COUNTS branch and the ranking branch must observe the
   SAME physical partitioning (range boundaries come from a sample;
   two independent re-executions could disagree). Checkpointing
   materializes the exchange once for both consumers (the house
   multi-consumer rule: Catalyst has no cross-branch CSE).
3. A P-row per-partition aggregate (count / sum / min) turns into
   exclusive prefix OFFSETS via a window over the P-row relation
   (P = shuffle partitions, dimension-sized by construction), then
   broadcasts back; each partition finishes its ranks locally:
   ``global = local_window(pid) + offset(pid)``.

Cost: two full-data exchanges (range + hash-by-pid), both P-way
parallel — strictly better at scale than one exchange into ONE task,
and the P-row offset window is the only single-partition stage left.

Exactness: ranks, ntiles and integer prefix sums are integers; ntile
uses the closed form of SQL NTILE (first ``n mod k`` buckets get
``ceil(n/k)`` rows) computed from the global row_number, bit-identical
to ``Window.orderBy(...).ntile(k)`` and to DuckDB's NTILE. Equality
with the single-partition window form is pinned per call site in
tests/test_round8_fixes.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_PID = "__gr_pid"
_OFF = "__gr_off"
_TOT = "__gr_tot"

# Adaptive cutover: below this row count the windowed relation
# provably fits one task (a few hundred MB of narrow rows) and the
# classic single-partition window is STRICTLY cheaper than the
# two-pass form (A/B at sf0.1, |customers| = 15k: 0.19s window vs
# 0.52s two-pass — the range exchange + checkpoint + offset join are
# pure overhead at dimension scale). Above it, one task would absorb
# the whole relation and the two-pass range-partitioned form takes
# over. The input is localCheckpointed either way (both paths reuse
# the materialization; the count that picks the path is a cheap
# driver action on it — the house bounded-collect pattern).
SMALL_RANK_THRESHOLD = 4_000_000


def _checkpoint_count(df: DataFrame, precomputed=None):
    """(checkpointed frame, row count). ``precomputed`` short-circuits:
    a ``(cached, n)`` pair from an enclosing helper (global_ntile's
    large path reuses global_row_number's materialization instead of
    paying a second localCheckpoint + count action — ADVICE r8), or a
    bare int count the CALLER already knows (skips the count job; the
    frame is still checkpointed once for the two-branch large path)."""
    if isinstance(precomputed, tuple):
        return precomputed
    cached = df.localCheckpoint(eager=False)
    if precomputed is not None:
        return cached, int(precomputed)
    return cached, cached.count()


def _num_partitions(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return int(num_partitions)
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _staged(df: DataFrame, order: list[Column], num_partitions: int | None):
    """Range-partition ``df`` on ``order`` and pin the physical
    placement (checkpoint) so the counts branch and the rank branch
    see identical partitions. Returns the staged frame with ``_PID``."""
    p = _num_partitions(df, num_partitions)
    return (
        df.repartitionByRange(p, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )


def _offsets(
    staged: DataFrame, agg_col: Column, zero, combine=F.sum
) -> DataFrame:
    """P-row relation (pid, exclusive-prefix offset, grand total) from a
    per-partition aggregate — the only single-partition window, over at
    most ``spark.sql.shuffle.partitions`` rows. ``combine`` folds the
    per-partition aggregates across earlier partitions (sum for
    rank/prefix-sum, min for prefix-min)."""
    per = staged.groupBy(_PID).agg(agg_col.alias("__a"))
    w_prev = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        _PID,
        F.coalesce(combine("__a").over(w_prev), F.lit(zero)).alias(_OFF),
        combine("__a").over(w_all).alias(_TOT),
    )


def global_row_number(
    df: DataFrame,
    order: list[Column],
    out: str,
    num_partitions: int | None = None,
    with_total: str | None = None,
    small_threshold: int = SMALL_RANK_THRESHOLD,
    precomputed_count: int | None = None,
    _precomputed=None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order)`` without the
    single-partition exchange. ``order`` must be a TOTAL order (include
    a unique tiebreak column) so the result is deterministic. When
    ``with_total`` is given, the global row count rides along as an
    extra column (free — the offsets relation already carries it).
    ``small_threshold``: row count below which the single-window path
    runs instead (identical output, pinned). ``precomputed_count``: an
    exact row count the caller already holds — skips the count job."""
    cached, n = _checkpoint_count(df, _precomputed or precomputed_count)
    if n <= small_threshold:
        w = Window.orderBy(*order)
        cols = [F.row_number().over(w).cast("long").alias(out)]
        if with_total:
            cols.append(F.lit(n).cast("long").alias(with_total))
        return cached.select(*cached.columns, *cols)
    staged = _staged(cached, order, num_partitions)
    off = _offsets(staged, F.count(F.lit(1)).cast("long"), 0)
    w_in = Window.partitionBy(_PID).orderBy(*order)
    cols = [
        (F.row_number().over(w_in).cast("long") + F.col(_OFF)).alias(out)
    ]
    if with_total:
        cols.append(F.col(_TOT).cast("long").alias(with_total))
    keep = [c for c in staged.columns if c != _PID]
    return staged.join(broadcast(off), _PID).select(*keep, *cols)


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) bucket from a 1-based global row_number ``rn`` and
    total count ``n`` — the closed form both engines implement: with
    q = n div k and r = n mod k, the first r buckets take q+1 rows.
    All divisions are LONG integer division (SQL ``div``, exact at any
    row count — the former ``(a / b).cast('long')`` form floored
    through a double and was exact only below 2^53; ADVICE r8), so the
    bucket is bit-identical to window NTILE unconditionally."""
    idiv = lambda a, b: F.call_function("div", a.cast("long"), b)  # noqa: E731
    q = idiv(n, F.lit(k))
    r = n % F.lit(k)
    head = r * (q + 1)
    return (
        F.when(rn <= head, idiv(rn - 1, q + 1) + 1)
        .when(F.lit(True), idiv(rn - head - 1, q) + r + 1)
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order: list[Column],
    k: int,
    out: str,
    num_partitions: int | None = None,
    small_threshold: int = SMALL_RANK_THRESHOLD,
    precomputed_count: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order)`` via global_row_number + the
    closed-form bucket assignment — identical output, no
    single-partition data exchange above the adaptive threshold."""
    cached, n = _checkpoint_count(df, precomputed_count)
    if n <= small_threshold:
        w = Window.orderBy(*order)
        return cached.withColumn(out, F.ntile(k).over(w))
    # thread the already-checkpointed frame + known count into the
    # nested call — the former form re-ran _checkpoint_count (a second
    # localCheckpoint plus a second full count action; ADVICE r8).
    rn = global_row_number(
        cached, order, "__gr_rn", num_partitions,
        with_total="__gr_n", small_threshold=0,
        _precomputed=(cached, n),
    )
    return rn.withColumn(
        out, ntile_from_rn(F.col("__gr_rn"), F.col("__gr_n"), k)
    ).drop("__gr_rn", "__gr_n")


def global_prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: str,
    out: str,
    inclusive: bool = True,
    num_partitions: int | None = None,
    small_threshold: int = SMALL_RANK_THRESHOLD,
    precomputed_count: int | None = None,
) -> DataFrame:
    """``sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING [AND
    -1])`` at scale: per-partition running sum + the broadcast sum of
    all earlier partitions. ``value`` must be an integer/decimal column
    (exactness: addition is associative there, so the two-pass
    regrouping is bit-identical to the one-pass window)."""
    cached, n = _checkpoint_count(df, precomputed_count)
    hi0 = Window.currentRow if inclusive else -1
    if n <= small_threshold:
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, hi0
        )
        return cached.select(
            *cached.columns,
            F.coalesce(F.sum(value).over(w), F.lit(0)).alias(out),
        )
    staged = _staged(cached, order, num_partitions)
    off = _offsets(staged, F.sum(value), 0)
    hi = hi0
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    keep = [c for c in staged.columns if c != _PID]
    return staged.join(broadcast(off), _PID).select(
        *keep,
        (F.coalesce(F.sum(value).over(w_in), F.lit(0)) + F.col(_OFF)).alias(
            out
        ),
    )


def global_prefix_min(
    df: DataFrame,
    order: list[Column],
    value: str,
    out: str,
    num_partitions: int | None = None,
    small_threshold: int = SMALL_RANK_THRESHOLD,
    precomputed_count: int | None = None,
) -> DataFrame:
    """``min(value) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED
    PRECEDING AND -1)`` (STRICT prefix — the skyline shape: "the best
    among everything ordered before me") at scale. NULL where no
    predecessor exists, matching the window form."""
    cached, n = _checkpoint_count(df, precomputed_count)
    if n <= small_threshold:
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return cached.select(
            *cached.columns, F.min(value).over(w).alias(out)
        )
    staged = _staged(cached, order, num_partitions)
    off = _offsets(
        staged, F.min(value), None, combine=F.min
    ).withColumnRenamed(_OFF, "__gr_pmin")
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = [c for c in staged.columns if c != _PID]
    # least() skips NULLs (returns NULL only when BOTH the in-partition
    # strict prefix and the earlier-partitions min are empty — i.e. the
    # global first row), matching the window form's NULL.
    return staged.join(broadcast(off.drop(_TOT)), _PID).select(
        *keep,
        F.least(F.min(value).over(w_in), F.col("__gr_pmin")).alias(out),
    )
