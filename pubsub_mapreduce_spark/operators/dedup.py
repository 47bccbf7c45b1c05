"""Deduplication operators over the ``documents`` table — the
training-data-pipeline surface (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

All declarative DataFrame compositions; the only shuffles are on the
natural keys (content hash / shingle / band signature), each with
map-side partial aggregation. No Python UDFs anywhere in this module.

Scale notes (100TB of documents):
- exact: one shuffle on a 128-bit content hash; skew-free by construction.
- MinHash-LSH: cost is |shingles| for signatures (one shuffle on doc_id),
  then |docs| x bands for bucketing. Banding keeps the candidate self-join
  quadratic only within a bucket — the whole point of LSH. Giant buckets
  (degenerate content) are capped via a per-bucket size guard.
- SimHash: 32x bit-explode before the (doc, bit) aggregate; partial agg
  collapses it map-side to 32 rows per doc.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import round_half_up, token_hash32, tokens

# 2^31-1: big enough for 32-bit shingle hashes, small enough that the
# universal-hash product a*h stays inside int64 (ANSI overflow checking on)
MERSENNE_P = (1 << 31) - 1
N_PERM = 64
LSH_BANDS = 16  # 16 bands x 4 rows: ~50% candidate recall at jaccard 0.5


def _perm_coeffs(n_perm: int = N_PERM, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a*x + b) mod p."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P - 1), rng.randrange(0, MERSENNE_P - 1))
        for _ in range(n_perm)
    ]


def normalized_text(col="text"):
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def content_hash(col="text"):
    return F.md5(normalized_text(col).cast("binary"))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by normalized-content hash: one group per distinct
    content, keeper = min doc_id, n_copies for audit. Single shuffle on
    the md5 hash (uniform, skew-free)."""
    return (
        docs.select(F.col("doc_id"), content_hash().alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(docs: DataFrame, n: int = 3, text: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle string).
    Built with a sequence/transform HOF (codegen), then explode+distinct."""
    toks = tokens(normalized_text(text))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # docs shorter than n tokens produce their whole text as one shingle
    return (
        docs.select("doc_id", F.explode(grams).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """EXACT n-gram Jaccard similar pairs (a < b, jaccard >= threshold).

    shingle-inverted-index self-join: shuffle on shingle, pairs generated
    only for docs sharing a shingle (never the full cross product), then
    |A ∩ B| counted per pair and |A|,|B| joined back in. This is the
    exact-verification oracle that MinHash approximates.

    At 100TB the shingle join is the hotspot: stopword-like shingles give
    skewed keys -> we drop shingles shared by more than ``max_df`` docs
    (they carry no discriminative signal; standard trick). Here max_df is
    high enough to be a no-op at test SF.
    """
    sh = word_shingles(docs, n=n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    max_df = 1000
    common_shingles = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= max_df)
    )
    sh_f = sh.join(common_shingles.select("shingle"), "shingle")
    a = sh_f.select(F.col("doc_id").alias("a"), "shingle")
    b = sh_f.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, n: int = 3, n_perm: int = N_PERM, seed: int = 42
) -> DataFrame:
    """MinHash signatures: per doc, ``min((a_i*h + b_i) mod p)`` over its
    shingle hashes for each of n_perm permutations. The permutation axis
    is an array column (HOF transform), NOT an explode — so the shuffle is
    one row per (doc, shingle), aggregated with ``zip_with``-style
    elementwise min via array aggregate."""
    coeffs = _perm_coeffs(n_perm, seed)
    sh = word_shingles(docs, n=n)
    h = token_hash32(F.col("shingle"))
    hm = h % F.lit(MERSENNE_P)
    perms = F.array(
        *[((F.lit(a) * hm + F.lit(b)) % F.lit(MERSENNE_P)) for a, b in coeffs]
    )
    per_shingle = sh.select("doc_id", perms.alias("hs"))
    # elementwise min across rows: aggregate with array zip_with inside
    # a reduce-style agg -> use groupBy + array_agg-free approach:
    # F.min over posexploded index would shuffle n_perm x rows; instead
    # reduce pairwise via `zip_with(least)` in a custom aggregate is not
    # built-in, so we take the n_perm-explode ONCE on (doc, perm) after a
    # map-side partial min (Catalyst partial agg on (doc_id, idx)).
    exploded = per_shingle.select(
        "doc_id", F.posexplode("hs").alias("idx", "hv")
    )
    return (
        exploded.groupBy("doc_id", "idx")
        .agg(F.min("hv").alias("mh"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "mh"))).alias("sig_pairs"))
        .select(
            "doc_id",
            F.transform("sig_pairs", lambda s: s["mh"]).alias("signature"),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    n_perm: int = N_PERM,
    bands: int = LSH_BANDS,
    threshold: float = 0.5,
    seed: int = 42,
    verify: bool = True,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs, optionally
    verified with exact Jaccard (the scale path: LSH prunes the O(n^2)
    pair space to same-bucket candidates; exact verification then runs
    only on candidates).

    Returns (a, b, jaccard) like ``ngram_jaccard_pairs`` when
    verify=True; (a, b) candidates otherwise.
    """
    rows_per_band = n_perm // bands
    sig = minhash_signatures(docs, n=n, n_perm=n_perm, seed=seed)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        b.cast("string"),
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("signature"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        ),
                    ).cast("binary")
                ),
            )
        ).alias("band", "bucket"),
    )
    # guard degenerate buckets (identical boilerplate content at scale)
    bucket_sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bsz"))
    banded = banded.join(
        bucket_sizes.where(F.col("bsz") <= 10000).select("band", "bucket"),
        ["band", "bucket"],
    )
    left = banded.select("band", "bucket", F.col("doc_id").alias("a"))
    right = banded.select("band", "bucket", F.col("doc_id").alias("b"))
    cands = (
        left.join(right, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if not verify:
        return cands
    sh = word_shingles(docs, n=n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(sh.withColumnRenamed("doc_id", "a"), "a")
        .join(sh.withColumnRenamed("doc_id", "b"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, text: str = "text") -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Per token, a 32-bit md5-derived hash votes +1/-1 on each bit position;
    bit i of the fingerprint is 1 iff the summed vote is >= 0. Token
    multiplicity counts (standard SimHash). The (doc, bit) aggregate runs
    with map-side partial aggregation, so the 32x bit expansion never
    crosses the shuffle at full width.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(normalized_text(text))).alias("tok")
    ).select("doc_id", token_hash32(F.col("tok")).alias("h"))
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"),
        "h",
    ).select(
        "doc_id",
        "i",
        F.when(F.expr("(h >> i) & 1") == 1, 1).otherwise(-1).alias("vote"),
    )
    return (
        bits.groupBy("doc_id", "i")
        .agg(F.sum("vote").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") >= 0, F.expr("CAST(1 AS BIGINT) << i")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("simhash")
        )
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, found
    via the standard block-permutation trick: split the 32-bit key into
    (max_hamming+1) blocks; any pair within distance max_hamming agrees
    on at least one block -> join on (block_idx, block_value), then
    verify exact Hamming via bit_count(xor)."""
    n_blocks = max_hamming + 1
    block_bits = 32 // n_blocks
    sh = simhash(docs)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * block_bits).bitwiseAND(
                        F.lit((1 << block_bits) - 1)
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk", "blkval"),
    )
    left = blocks.select("blk", "blkval", F.col("doc_id").alias("a"), F.col("simhash").alias("sh_a"))
    right = blocks.select("blk", "blkval", F.col("doc_id").alias("b"), F.col("simhash").alias("sh_b"))
    return (
        left.join(right, ["blk", "blkval"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
