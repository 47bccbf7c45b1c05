"""Deterministic synthetic corpora at arbitrary scale.

The driver fixtures stop at sf0.1; stress-testing the 100TB claims
needs data BIGGER than any checked-in file. These generators build
documents/embeddings of any size from ``spark.range`` + hash math —
fully distributed (no driver data), reproducible (pure functions of the
row id, same rows at any partitioning), and schema-identical to the
fixtures so every operator runs unchanged.

Content model mirrors the fixtures' word-soup: each document samples
``n_tokens`` words from a small vocabulary by hashing (doc_id, position)
— realistic enough for tokenize/shingle/minhash/LSH cost profiles
(vocabulary collisions produce real near-dups and shared n-grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "the line sort window join shuffle filter map reduce stream state "
    "plan codec sink source knob rate total count flood mapper"
).split()


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    avg_tokens: int = 54,
    n_sources: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """``documents``-shaped relation of any size: (doc_id, text, lang,
    source, n_chars). One ``spark.range`` + a codegen'd token-array
    build; ~``avg_tokens`` +/- 50% tokens per doc."""
    vocab_arr = "array(" + ", ".join(f"'{w}'" for w in VOCAB) + ")"
    n_tok = (
        F.lit(avg_tokens // 2)
        + F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(avg_tokens))
    ).cast("int")
    text = F.expr(
        f"array_join(transform(sequence(1, __ntok), "
        f"i -> element_at({vocab_arr}, cast(pmod(xxhash64(id, i), "
        f"{len(VOCAB)}) + 1 as int))), ' ')"
    )
    d = (
        spark.range(0, n_docs, 1, partitions or max(8, n_docs // 50_000))
        .withColumn("__ntok", n_tok)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.when(F.pmod(F.xxhash64("id", F.lit(2)), 10) < 7, "en")
            .when(F.pmod(F.xxhash64("id", F.lit(2)), 10) < 9, "de")
            .otherwise("fr")
            .alias("lang"),
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("id", F.lit(3)), n_sources)
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    return d


def synthetic_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    n_labels: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """``embeddings``-shaped relation: (vec_id, embedding array<float>,
    label). Components are hash-uniform in [-1, 1) — isotropic like the
    fixture vectors."""
    emb = F.expr(
        f"transform(sequence(1, {dim}), "
        f"i -> cast(pmod(xxhash64(id, i), 2000000) / 1000000.0 - 1.0 as float))"
    )
    return spark.range(0, n_vecs, 1, partitions or max(8, n_vecs // 100_000)).select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(9)), n_labels).cast("int").alias("label"),
    )
