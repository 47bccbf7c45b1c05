"""Opt-in Kafka integration: the same stream==batch pins the FileTopic
suite runs, but over a REAL broker via KafkaTopic (sources/topic.py).

Gated on the environment because the sandbox ships neither a broker nor
the spark-sql-kafka connector jar:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 \
    SPARK_GRAFT_KAFKA_JARS=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver> \
        python -m pytest tests/test_kafka_integration.py

Set SPARK_GRAFT_KAFKA_JARS to a spark.jars.packages coordinate (picked
up by the session builder before the JVM starts) or pre-bake the jar
onto the classpath. Without both prerequisites every test here SKIPS
cleanly — the broker form adds transport, not semantics, so the
FileTopic pins remain the correctness source of truth locally.
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker in sandbox)",
)


@pytest.fixture(scope="module")
def kafka_spark():
    """Session with the Kafka connector on the classpath (via
    SPARK_GRAFT_KAFKA_JARS -> spark.jars.packages) — separate from the
    shared test session, which may predate the jar config."""
    from pyspark.sql import SparkSession

    from pubsub_mapreduce_spark.sources.topic import kafka_available

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
    )
    pkgs = os.environ.get("SPARK_GRAFT_KAFKA_JARS")
    if pkgs:
        builder = builder.config("spark.jars.packages", pkgs)
    spark = builder.getOrCreate()
    if not kafka_available(spark):
        spark.stop()
        pytest.skip("spark-sql-kafka connector not on the classpath")
    yield spark
    spark.stop()


@pytest.fixture()
def topic(kafka_spark):
    from pubsub_mapreduce_spark.sources.topic import KafkaTopic

    return KafkaTopic(BOOTSTRAP, f"spark_graft_it_{uuid.uuid4().hex[:12]}")


def _knobs(spark, n=50, ticks=4):
    from pubsub_mapreduce_spark.sources.knobs import knob_batch

    return knob_batch(spark, n=n, ticks=ticks, tick_ms=250)


def test_publish_read_batch_roundtrip(kafka_spark, topic):
    """Envelope codec + broker transport round-trips every row."""
    src = _knobs(kafka_spark).select(
        "id", "n", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_s")
    )
    topic.publish(src, key="id")
    back = topic.read_batch(kafka_spark, "id long, n long, ts_s string")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_lww_stream_over_broker_matches_batch(kafka_spark, topic, tmp_path):
    """The T1 latest-per-key pin, FileTopic's flagship stream==batch
    check, run over the broker: subscribe -> latest_per_key_stream ->
    final state equals the batch max_by replay of the published rows."""
    from pubsub_mapreduce_spark.streaming.pipeline import latest_per_key_stream

    src = _knobs(kafka_spark).select(
        "id", "n", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_s")
    )
    topic.publish(src, key="id")
    stream = topic.subscribe(
        kafka_spark, "id long, n long, ts_s string", max_offsets_per_trigger=64
    ).select("id", "n", F.to_timestamp("ts_s").alias("ts"))

    batches: list = []

    def sink(df, epoch_id):
        batches.append((epoch_id, df.collect()))

    q = (
        latest_per_key_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got: dict = {}
    for _, rows in sorted(batches, key=lambda b: b[0]):
        for r in rows:
            got[r["id"]] = (r["n"], r["ts"])
    expect = {
        r["id"]: (r["n"], r["ts"])
        for r in src.select("id", "n", F.to_timestamp("ts_s").alias("ts"))
        .groupBy("id")
        .agg(F.max_by("n", "ts").alias("n"), F.max("ts").alias("ts"))
        .collect()
    }
    assert got == expect
