"""The reference pipeline T1-T8 as a batch DataFrame operator library.

Each function is the batch-replay form of one stage of the reference's
streaming topology (SURVEY.md section 2.3); the streaming forms live in
``streaming.pipeline``. Inputs are long-format ``(key, ts, value)`` rows —
the `events` fixture plays the role of the knob stream (`user_id` = knob
id, `ts` = event time, `value`/`props.k` = knob value).

Scale notes (100TB):
- Every operator here is a single shuffle on its natural key (or none).
- T1 uses ``max_by`` aggregation, which gets Catalyst's partial/final
  HashAggregate split automatically — the map-side partial IS the
  reference's mapper stage (SURVEY.md section 4).
- T7's global cumulative form is a inherently order-serial; the per-key
  form (partitionBy key) is the scalable one and the default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import round_half_up


def lateness_profile(events: DataFrame) -> DataFrame:
    """Out-of-order-arrival profile: per event type, how many events
    arrived with an event time EARLIER than something already seen for
    that user (arrival order = event_id), and the worst lateness — the
    empirical basis for choosing a watermark delay (SURVEY §2.5: the
    reference handles lateness only via T1's LWW guard; Structured
    Streaming needs a delay NUMBER, and this measures it from data).

    One user-keyed window (running max of event time in arrival order),
    one tiny per-type rollup. Lateness = running_max - ts in exact
    epoch-double seconds."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tt = F.col("tt")
    prior_max = F.max(tt).over(w)
    lateness = F.when(prior_max > tt, prior_max - tt).otherwise(F.lit(0.0))
    return (
        events.select(
            "user_id", "event_id", "event_type", F.col("ts").cast("double").alias("tt")
        )
        .withColumn("late_s", lateness)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("late_s") > 0, 1)).alias("n_late"),
            round_half_up(
                F.count(F.when(F.col("late_s") > 0, 1)) / F.count(F.lit(1)), 6
            ).alias("late_frac"),
            round_half_up(F.max("late_s"), 3).alias("max_late_s"),
        )
    )


def latest_per_key(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    payload: tuple[str, ...] = ("value",),
) -> DataFrame:
    """T1 — last-write-wins upsert by event time (knobs.go:58, 92-103).

    Keeps, per key, the payload of the row with max ``ts``. The reference
    keeps the *first-received* message on an exact ts tie (strict ``<``
    guard, knobs.go:101); arrival order does not exist in batch replay, so
    we break ties deterministically by max ``tiebreak`` (documented
    divergence, SURVEY.md section 7 item 3).

    Implementation: ``max_by(struct(payload), struct(ts, tiebreak))`` —
    one shuffle on the key with map-side partial aggregation. Intentionally
    NOT dropDuplicates (keeps first, not latest) and NOT a row_number
    window (extra sort; max_by is agg-based and cheaper at scale).
    """
    order = F.struct(F.col(ts), F.col(tiebreak))
    aggs = [F.max_by(F.col(c), order).alias(c) for c in (*payload, ts, tiebreak)]
    return df.groupBy(key).agg(*aggs)


def snapshot_scale(
    snapshot: DataFrame,
    value: str = "value",
    delta: float = 0.2,
    out: str = "quota",
) -> DataFrame:
    """T2 — rate scaling + zero suppression (knobs.go:57-80).

    Per-tick quota ``floor(value * delta)`` (the reference's TIME_DELTA
    0.2 at a 200ms tick, knobs.go:19,64) and drop zero rows — the
    long-format equivalent of "suppress if the whole vector is zero"
    (knobs.go:68-70): a zero slot contributes nothing downstream.
    """
    quota = F.floor(F.col(value) * F.lit(delta)).cast("long")
    return snapshot.withColumn(out, quota).where(F.col(out) > 0)


def fan_out(
    df: DataFrame,
    key: str = "user_id",
    n: str | Column = "n",
    out: str = "seq",
    max_n: int | None = None,
) -> DataFrame:
    """T3 — explode-by-count fan-out (flood.go:57-85).

    One row ``(key, n)`` becomes ``n`` rows ``(key, seq)`` — the
    reference's double loop emitting ``Ns[id]`` individual hex messages.
    Built as ``explode(sequence(1, n))``: a generator inside whole-stage
    codegen, no shuffle at all — fan-out parallelism is partition
    parallelism, exactly the reference's 8-replica competing-consumer
    scale-out (deploy:75). Rows with ``n <= 0`` emit nothing (the inner
    loop body runs zero times).

    ``max_n`` clamps a single row's fan-out (C2 flow control: the
    reference caps requests at 200k/knob, README.md:4, and outstanding
    messages at 1e6, mapper.go:48-51) so one poison-but-parseable huge
    ``n`` cannot OOM an executor building the sequence array. Batch
    default is None (exact, oracle-checked); the streaming form clamps
    by default.
    """
    n_col = F.col(n) if isinstance(n, str) else n
    n_col = n_col.cast("long")
    if max_n is not None:
        n_col = F.least(n_col, F.lit(int(max_n)))
    guarded = F.when(n_col > 0, F.sequence(F.lit(1), n_col))
    return (
        df.withColumn("__seq", F.explode(guarded))
        .select(key, F.col("__seq").alias(out))
    )


def windowed_count(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window: str = "1 hour",
) -> DataFrame:
    """T4+T5 — tumbling-window count per key (mapper.go:64-86 partials +
    reducer.go:145-153 merge).

    ``groupBy(window(ts), key).count()`` — Catalyst's partial/final
    HashAggregate split IS the mapper/reducer two-stage topology: the
    partial node is the reference's 100ms swap-and-reset counter
    (mapper.go:71), the final node the reducer's elementwise merge.
    Empty windows are absent by construction (mapper.go:75 suppression).
    Window start is emitted as epoch seconds (long) for stable cross-engine
    comparison.
    """
    return (
        df.groupBy(F.window(F.col(ts), window).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            key,
            "cnt",
        )
    )


def merge_partials(
    partials: DataFrame,
    key: str = "user_id",
    window_start: str = "window_start_s",
    cnt: str = "cnt",
) -> DataFrame:
    """T5 standalone — sum of partial counts per key (reducer.go:145-153),
    for when partials arrive pre-aggregated (e.g. from per-shard streams).
    """
    return partials.groupBy(window_start, key).agg(F.sum(cnt).alias(cnt))


def rate_per_window(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window: str = "1 day",
    window_seconds: int = 86400,
) -> DataFrame:
    """T6 — per-window message rate (reducer.go:77-89): count per tumbling
    window per key, plus the rate normalized to per-second (the reference's
    ``mps`` vector at its 1s window is just the count; at wider windows the
    normalization matters)."""
    counted = windowed_count(df, key=key, ts=ts, window=window)
    return counted.withColumn(
        "per_sec", round_half_up(F.col("cnt") / F.lit(window_seconds), 6)
    )


def running_total(
    df: DataFrame,
    key: str | None = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str | Column = None,
    out: str = "running_total",
) -> DataFrame:
    """T7 — running total across all time (reducer.go:79,87).

    Default is the per-key cumulative sum (partitionBy key, orderBy ts):
    scales because each key's series sorts within its own partition. Pass
    ``key=None`` for the reference's single global accumulator — correct
    but order-serial (single-partition window), only for low-volume
    pre-aggregated inputs (the reference's reducer sees ~80 msg/s, not the
    raw stream, which is why a global counter was viable there).
    """
    val = F.col("value") if value is None else (F.col(value) if isinstance(value, str) else value)
    w = Window.orderBy(ts, tiebreak)
    if key is not None:
        w = Window.partitionBy(key).orderBy(ts, tiebreak)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(val).over(w))


def emit_on_change(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """T8 — emit only when the value changed (reducer.go:92-98: skip the
    IoT push when ``total == lastTotal``). Batch form: keep rows whose
    value differs from the previous row's per key (first row always
    emits, as does the reference's first push)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    with_prev = df.withColumn("__prev", F.lag(F.col(value)).over(w))
    return with_prev.where(
        F.col("__prev").isNull() | (F.col(value) != F.col("__prev"))
    ).drop("__prev")


def densify_to_vector(
    df: DataFrame,
    key: str = "user_id",
    value: str = "cnt",
    n_keys: int | None = None,
) -> DataFrame:
    """Wire-format re-densification: long ``(key, value)`` rows back into
    the reference's dense ``array<long>`` vector shape (``Ns`` /
    ``messages`` / ``mps``, util/util.go:12-23), absent keys zero-filled.
    Arrays are a wire format, not a processing shape (SURVEY.md section
    1.4) — use only at the sink edge. One broadcast-joined sequence spine,
    then an array_agg ordered by key."""
    spark = df.sparkSession
    if n_keys is None:
        max_key = df.agg(F.max(key)).first()[0]
        n_keys = 0 if max_key is None else max_key + 1  # empty input -> []
    spine = spark.range(n_keys).withColumnRenamed("id", key)
    joined = spine.join(df.select(key, value), on=key, how="left").na.fill({value: 0})
    return joined.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(key), F.col(value)))
        ).alias("_pairs")
    ).select(F.transform("_pairs", lambda p: p[value]).alias("vector"))


def props_stats(events: DataFrame) -> DataFrame:
    """Dynamic-JSON analytics at scale (the F3 surface, knobs.go:93-100,
    grown into a real query): per event_type, stats over the ``props.k``
    payload field.

    Spark 4 idiom: ``parse_json`` converts the string column to
    VariantType ONCE — a binary semi-structured encoding whose typed
    ``variant_get`` extractions are far cheaper than re-parsing the JSON
    text per path (get_json_object re-tokenizes the string for every
    path it's asked for). With one path the two tie; with k paths the
    variant parse amortizes k:1, which is the 100TB shape (real event
    payloads carry dozens of fields). ``try_parse_json`` + a missing key
    both yield NULL, which count/sum/min/max skip — the reference's
    recover-and-ack poison handling (knobs.go:85-90) as null semantics
    instead of a failed job (strict ``parse_json`` would abort the whole
    query on ONE malformed payload, the opposite of recover-and-ack)."""
    k = F.variant_get(F.try_parse_json(F.col("props")), "$.k", "long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            round_half_up(F.avg("k"), 6).alias("avg_k"),
        )
    )
