"""Edge-case behavior pinned: poison-sized fan-out counts, empty inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators.pipeline import densify_to_vector, fan_out
from pubsub_mapreduce_spark.streaming.pipeline import fan_out_stream


def test_fan_out_clamps_poison_counts(spark):
    """A parseable-but-huge n is clamped (C2 flow control), not exploded
    into an executor-killing sequence array."""
    df = spark.createDataFrame(
        [(0, 3_000_000_000), (1, 3), (2, -5)], "user_id long, n long"
    )
    out = fan_out(df, n="n", max_n=1000)
    got = {
        r["user_id"]: r["c"]
        for r in out.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == {0: 1000, 1: 3}  # clamped, exact, suppressed


def test_fan_out_stream_default_clamp_matches_reference_cap(spark, tmp_path):
    """The streaming form clamps at 1e6 by default (mapper.go:48-51)."""
    src = str(tmp_path / "poison")
    spark.createDataFrame(
        [(0, 2_000_000, "2024-01-01 00:00:00")], "id long, quota long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema("id long, quota long, ts timestamp").parquet(src)
    q = (
        fan_out_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("poison_fan")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) c from poison_fan").first()["c"] == 1_000_000


def test_densify_empty_input(spark):
    """Empty long-format input densifies to an empty vector, not a crash."""
    df = spark.createDataFrame([], "user_id long, cnt long")
    out = densify_to_vector(df).collect()
    assert len(out) == 1 and out[0]["vector"] == []


def test_clean_text_scrubs_urls_emails_whitespace(spark):
    from pubsub_mapreduce_spark.operators.textops import clean_text

    docs = spark.createDataFrame(
        [
            (1, "Visit https://example.com/a?b=1 NOW", "en", "s"),
            (2, "mail me: bob@example.com\t thanks", "en", "s"),
            (3, "  Plain   TEXT \n with   runs  ", "en", "s"),
            (4, "http://a.b c@d.e tail", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["doc_id"]: r["clean_text"] for r in clean_text(docs).collect()}
    assert got[1] == "visit now"
    assert got[2] == "mail me: thanks"
    assert got[3] == "plain text with runs"
    assert got[4] == "tail"
