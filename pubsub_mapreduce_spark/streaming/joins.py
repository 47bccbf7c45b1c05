"""Stream-stream time-interval join.

The reference topology has no joins anywhere (SURVEY.md §2.6) — each
stage is keyed only by position in the pipeline. But its request/response
shape (a knob REQUESTS a rate, the reducer pushes back an ACK via IoT
config, reducer.go:91-133) is exactly the join every real event pipeline
eventually needs: match each request to the response that arrived within
a bounded delay. Structured Streaming supports this natively when BOTH
sides carry watermarks and the join condition bounds event-time distance
— the two facts together let the state store purge rows older than the
horizon, so state is O(rows inside the watermark window), not O(stream).

Scale shape: one shuffle of each stream on the equi key per micro-batch;
matches happen inside the state store partition-locally. The time bound
is the knob that caps state: widen it and state (and output multiplicity)
grows linearly with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    requests: DataFrame,
    responses: DataFrame,
    key: str = "id",
    req_ts: str = "req_ts",
    resp_ts: str = "resp_ts",
    max_delay: str = "10 seconds",
    watermark: str = "30 seconds",
    join_type: str = "inner",
) -> DataFrame:
    """Join each request to same-key responses with
    ``req_ts <= resp_ts <= req_ts + max_delay``.

    Both inputs must use DISTINCT timestamp column names (they meet in
    one row). Works identically on batch DataFrames (watermark is a
    no-op there) — tests pin stream == batch.

    ``join_type='leftOuter'`` emits unmatched requests with null response
    columns, but only once the watermark passes the request's join
    horizon — under ``availableNow`` draining, outer rows for the final
    watermark window may need a follow-up trigger to flush (Spark
    stream-stream outer-join semantics; documented, not worked around).
    """
    req = requests.withWatermark(req_ts, watermark)
    resp = responses.withWatermark(resp_ts, watermark)
    cond = (
        (req[key] == resp[key])
        & (resp[resp_ts] >= req[req_ts])
        & (resp[resp_ts] <= req[req_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return req.join(resp, cond, join_type).drop(resp[key])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "id",
    join_type: str = "left",
) -> DataFrame:
    """Enrich a stream with a STATIC dimension table (the knob-metadata
    lookup the reference hard-codes as array-index routing,
    util/util.go:10 — generalized to an arbitrary dim join).

    Stream-static joins are STATELESS: no watermark, no state store —
    each micro-batch joins against the (re-resolvable) static side, so
    dim-table updates between micro-batches are picked up on file
    sources. The static side rides a broadcast: per micro-batch cost is
    a map-side hash lookup, zero shuffle of the stream. At 100TB/day of
    stream and a dims table that fits an executor (the common case),
    this is the cheapest join Spark has; a huge dim side instead wants
    the stream bucketed to the dim's layout.

    ``left`` keeps unmatched stream rows (nulls for dim columns) —
    at-least-once enrichment never drops events because a dim row is
    late; use ``inner`` to gate on dim membership instead.
    """
    return stream.join(F.broadcast(dim), on=key, how=join_type)
