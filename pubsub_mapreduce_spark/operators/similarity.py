"""Similarity search over the ``embeddings`` table (``array<float>``).

Three tiers:
- ``cosine_topk``      : exact brute-force top-k for a query subset —
                         the correctness baseline, oracle-checked.
- ``ann_lsh_topk``     : random-hyperplane LSH bucketing — the scale
                         path; candidates only within matching buckets.
- ``ann_ivf_topk``     : IVF-style coarse quantization with deterministic
                         centroids + nprobe search.
- ``embedding_near_pairs``: all pairs above a cosine threshold (near-dup
                         by embedding).

Vector math is JVM-side HOFs (functions.vectors) — no Python in the
scoring loop. For very large k*dim a Pandas-UDF matmul formulation would
win on constant factors; at 64-dim the HOF path keeps everything in
whole-stage codegen and avoids the Arrow boundary.

Scale notes: brute force is O(|Q| * |N|) — run it only on a bounded query
set. LSH/IVF cut |N| per query by bucketing; both express the bucket
assignment as a broadcast join against a tiny plan-side table (hyperplanes
/ centroids), so the only big shuffle is the per-bucket candidate join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.vectors import cosine, norm

DIM = 64


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cast float32 embeddings to double once, up front — all downstream
    arithmetic is then double in both Spark and the DuckDB oracle, keeping
    cross-engine noise at the 1e-15 level (<< ranking gaps)."""
    return df.withColumn(col, F.col(col).cast("array<double>"))


def query_subset(emb: DataFrame, every: int = 50) -> DataFrame:
    """Deterministic query set: every ``every``-th vec_id."""
    return emb.where(F.col("vec_id") % every == 0)



def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared ranking epilogue: deterministic (sim desc, neighbor_id asc)
    row_number top-k per query, sim rounded for cross-engine comparison.
    ONE definition so every formulation ranks identically."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def cosine_topk(
    emb: DataFrame, k: int = 5, every: int = 50, exclude_self: bool = True
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine for the query subset.

    Broadcast the (small) query side against the full candidate scan; rank
    per query with a row_number window partitioned by query id (sort only
    within each query's candidate list). Ties broken by neighbor id.

    The corpus side is widened to >=8 partitions before the scoring
    join: the |corpus| x |queries| HOF dot products are the hot map
    stage, and a single-row-group fixture scan otherwise runs them on
    one core (A/B at sf0.1: 3.0s -> 1.5s at width 8; 16/32 slower
    again — same width-matters trade-off as minhash_lsh_pairs). No-op
    on real multi-partition scans.
    """
    e = _as_double(emb).select("vec_id", "embedding")
    q = query_subset(e, every).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    from ..io import widen

    pairs = widen(e, 8).join(
        broadcast(q), F.col("vec_id") != F.col("query_id") if exclude_self else F.lit(True)
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("sim"),
    )
    return _topk(scored, k)


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup.

    Brute-force form for oracle checking; at scale run the same verify
    over ``ann_lsh_topk``-style bucket candidates instead of the full
    cross join.
    """
    e = _as_double(emb).select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def cosine_topk_matmul(
    emb: DataFrame, k: int = 5, every: int = 50, exclude_self: bool = True
) -> DataFrame:
    """Exact brute-force top-k — the Arrow/Pandas-UDF matrix-multiply
    formulation of ``cosine_topk``, for when k*dim is large enough that
    BLAS beats the per-element HOF path.

    Shape: the (bounded) query matrix ships to every task in the UDF
    closure (a broadcast by construction); each Arrow batch scores
    candidates against ALL queries in one ``(N, D) @ (D, Q)`` matmul and
    emits only its LOCAL top-k per query, so the shuffle to the global
    top-k window carries at most partitions * Q * k rows — never the
    full |corpus| x |Q| score matrix."""
    import pandas as pd

    e = _as_double(emb).select("vec_id", "embedding")
    q_pd = query_subset(e, every).toPandas()
    q_ids = q_pd["vec_id"].to_numpy()
    q_mat = np.stack(q_pd["embedding"].to_numpy()).astype(np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_norms[q_norms == 0] = np.inf  # zero query -> all sims 0.0, like cosine()
    q_mat /= q_norms

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = np.inf  # zero candidate -> sim 0.0
            sims = (m / norms) @ q_mat.T  # (N, Q)
            out = {"query_id": [], "neighbor_id": [], "sim": []}
            for j, qid in enumerate(q_ids):
                s = sims[:, j]
                mask = ids != qid if exclude_self else np.ones_like(ids, bool)
                cand_idx = np.nonzero(mask)[0]
                # lexsort: primary -sim, secondary neighbor_id asc — the
                # SAME tie-break as _topk, so the local cut never drops a
                # candidate the global ranking would have kept
                order = np.lexsort((ids[cand_idx], -s[cand_idx]))[:k]
                top = cand_idx[order]
                out["query_id"].extend([qid] * len(top))
                out["neighbor_id"].extend(ids[top])
                out["sim"].extend(s[top])
            yield pd.DataFrame(out)

    partial = e.mapInPandas(score, "query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def _hyperplanes(n_planes: int, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 5,
    every: int = 50,
    n_tables: int = 16,
    planes_per_table: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: L
    independent hash tables of b sign bits each; a vector is a candidate
    for a query if they collide in ANY table (OR-amplification).

    A single b-bit table requires agreement on all b hyperplanes — at
    cosine ~0.5 (per-plane agreement ~2/3) one 8-bit table has ~4%
    recall, measured exactly that on the fixtures. With L=16 tables of 4
    bits, per-table collision ~0.2 and miss probability (1-0.2)^16 ~ 3%
    -> ~97% recall at ~L*2^-b of the corpus scored per query. The index
    is L rows per vector (the classic LSH space-for-recall trade);
    recall floor pinned in tests/test_ann_recall.py.

    Plan shape (A/B-measured at sf0.1, 3 reps/variant in one session):
    the 64 plane dots are a NESTED HOF LOOP over a 3-level literal
    planes array, not 64 unrolled fold expressions — unrolled codegen
    ran 2x slower warm (5.9-7.6s vs ~3.0s) and compiled far slower
    cold. The whole bucket expression is rendered as ONE SQL string
    (``sql_array_lit``): building the 4096-leaf plane table from
    per-element F.lit Columns measured 2.8-4s of py4j plan-construction
    time per call — more than the query's execution — vs ~0.1s for a
    single parse (total 3.7s -> ~1.9s, parity-tested). The input is
    widened first: bucket computation is pure per-row math, and the
    fixtures' single-row-group scan would otherwise run it on one core
    (no-op at 100TB where scans carry >= cores partitions).
    """
    from ..functions.vectors import sql_array_lit, sql_dot
    from ..io import widen

    all_planes = _hyperplanes(n_tables * planes_per_table, seed=seed)
    tables = [
        all_planes[t * planes_per_table : (t + 1) * planes_per_table]
        for t in range(n_tables)
    ]
    weights = "array(" + ",".join(f"{1 << i}L" for i in range(planes_per_table)) + ")"
    buckets = F.expr(
        f"""transform({sql_array_lit(tables)}, tp -> aggregate(
              zip_with(tp, {weights},
                (p, w) -> CASE WHEN {sql_dot('p', 'embedding')} >= 0
                          THEN w ELSE 0L END),
              0L, (acc, v) -> acc + v))"""
    )
    e = widen(_as_double(emb).select("vec_id", "embedding"), 8)
    # index: one row per (vector, table) with that table's sign-bit bucket
    indexed = e.select(
        "vec_id", "embedding", F.posexplode(buckets).alias("table", "bucket")
    )
    q = query_subset(indexed, every).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "table",
        "bucket",
    )
    cands = (
        indexed.join(broadcast(q), on=["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", "vec_id", "embedding")
        # collided in >=1 table -> score once; embeddings are functionally
        # determined by the ids, so id-only dedup is exact and cheaper
        # than comparing the array payloads
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("sim"),
    )
    return _topk(scored, k)


def embedding_norm_stats(emb: DataFrame) -> DataFrame:
    """Per-label embedding profile: count, mean/min/max L2 norm — the
    sanity sweep a pipeline runs before trusting a new embedding batch
    (all-zero vectors, scale drift between model versions, label skew).
    Norms are a codegen'd HOF fold computed map-side; the only shuffle is
    the |labels|-sized aggregate."""
    from ..functions.text import round_half_up as rh

    e = _as_double(emb)
    nrm = norm(F.col("embedding"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        rh(F.avg(nrm), 4).alias("avg_norm"),
        rh(F.min(nrm), 4).alias("min_norm"),
        rh(F.max(nrm), 4).alias("max_norm"),
    )


def _centroid_sims_sql(cents: list[tuple[int, list[float]]], col: str) -> str:
    """SQL text for array<struct<cid, csim>> of cosine sims between
    ``col`` and every centroid — centroids ride as plan literals
    (ascending-cid order). Rendered as one expression string: per-element
    F.lit construction of a 512x64 centroid table costs seconds of py4j
    round trips (see ann_lsh_topk docstring)."""
    from ..functions.vectors import sql_array_lit, sql_cosine

    cids = "array(" + ",".join(f"{int(c)}L" for c, _ in cents) + ")"
    vecs = sql_array_lit([v for _, v in cents])
    return (
        f"zip_with({cids}, {vecs}, "
        f"(i, p) -> named_struct('cid', i, 'csim', {sql_cosine('p', col)}))"
    )


def _centroid_sims(cents: list[tuple[int, list[float]]], col: str):
    return F.expr(_centroid_sims_sql(cents, col))


def _nearest_centroid(cents: list[tuple[int, list[float]]], col: str):
    """Argmax fold over ``_centroid_sims``: strict > keeps the first
    maximum, so ties resolve to the smallest cid (same tie-break as an
    (csim DESC, cid ASC) ranking)."""
    return F.expr(
        f"""aggregate({_centroid_sims_sql(cents, col)},
              named_struct('cid', CAST(-1 AS BIGINT), 'csim', -2.0D),
              (acc, x) -> CASE WHEN x.csim > acc.csim THEN x ELSE acc END)"""
    )


def refine_centroids(
    e: DataFrame, cents: list[tuple[int, list[float]]], iters: int = 1
) -> list[tuple[int, list[float]]]:
    """Lloyd (k-means) refinement of an IVF centroid set, spherical
    flavor: assign every vector to its nearest centroid by cosine, then
    recenter each cluster on its member mean. One distributed pass per
    iteration — assignment is the map-only literal argmax, the recenter
    is a (cid, dim)-keyed average of |corpus| x dim exploded values, and
    only |C| x dim aggregated means come back to the driver. Empty
    clusters keep their previous centroid. Deterministic end to end
    (seeded start, exact argmax, fixed iteration count — no RNG)."""
    for _ in range(iters):
        best = _nearest_centroid(cents, "embedding")
        # two selects: a generator (posexplode) in the same projection as
        # the HOF-aggregate trips lambda-field resolution in analysis
        assigned = e.select(best["cid"].alias("cid"), "embedding")
        means = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in range(len(vec))]
                if cid in by_cid
                else vec,
            )
            for cid, vec in cents
        ]
    return cents


def assign_centroids_matmul(
    e: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Scale path for nearest-centroid assignment when |C| outgrows a
    plan literal (>~1k centroids, a real IVF nlist at 100TB is 2^14+):
    the (C, D) centroid matrix rides in the UDF closure (a broadcast by
    construction) and each Arrow batch scores against ALL centroids in
    one ``(N, D) @ (D, C)`` BLAS matmul. Still map-only — no shuffle, no
    row blowup; output schema = input + ``cid``.

    Tie-break parity with ``_nearest_centroid``: centroid rows are in
    ascending-cid order and ``np.argmax`` returns the FIRST maximum, so
    equal sims resolve to the smallest cid on both paths (BLAS rounding
    can still flip near-equal sims — an assignment detail that ANN
    recall, not exact equality, is the contract for)."""
    import pandas as pd

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in cents])
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0] = np.inf  # zero centroid -> sim 0.0, like cosine()
    cmat = cmat / norms

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = np.inf  # zero vector -> all sims 0.0
            sims = (m / n) @ cmat.T  # (N, C)
            out = pdf[["vec_id", "embedding"]].copy()
            out["cid"] = cids[np.argmax(sims, axis=1)]
            yield out

    return e.mapInPandas(assign, "vec_id long, embedding array<double>, cid long")


def ann_ivf_topk(
    emb: DataFrame,
    k: int = 5,
    every: int = 50,
    centroid_every: int = 100,
    nprobe: int = 5,
    n_max_centroids: int = 512,
    refine_iters: int = 0,
    assign_via: str = "matmul",
) -> DataFrame:
    """IVF-flavored ANN: deterministic centroid set (every Nth vector
    stands in for k-means training, keeping the operator reproducible),
    vectors assigned to their nearest centroid, queries probe the
    ``nprobe`` nearest centroid lists.

    Plan shape: the centroid table is tiny BY CONSTRUCTION (|corpus| /
    centroid_every), so it ships as a plan-side LITERAL and nearest-
    centroid assignment is a map-only HOF argmax in a single projection —
    no crossJoin row blowup, and crucially no per-vector window (the
    previous formulation shuffled |corpus| x |C| rows, each carrying the
    64-dim embedding, just to rank them; measured 9s -> ~2s at sf0.1).
    Probes still rank via explode+window but only over the bounded query
    subset. The candidate join broadcasts the probe side, so the corpus
    is never shuffled before scoring; the only corpus-sized exchange is
    the final per-query top-k window over candidate rows.

    ``n_max_centroids`` caps the literal table like a real IVF nlist —
    an index constant, not data-proportional, so the plan stays bounded
    as the corpus grows. Assignment defaults to ``assign_via='matmul'``
    — the ``assign_centroids_matmul`` mapInPandas BLAS path (same
    closure-broadcast shape as ``cosine_topk_matmul``): Catalyst HOFs
    are interpreted per array element, so the |corpus|x|C|x|dim| argmax
    is exactly the shape BLAS wins (A/B at sf0.1, 100 centroids: 1.0s
    literal vs 0.6s matmul; the gap widens with |C|). The pure-JVM
    ``assign_via='literal'`` HOF argmax is kept for deployments that
    must avoid Python workers, and as the parity oracle for the BLAS
    path (tests pin identical assignments). Probes stay on the literal
    path either way because the query subset is bounded.

    ``refine_iters`` > 0 runs that many Lloyd iterations over the seed
    centroids (``refine_centroids``) before indexing — better-balanced
    inverted lists at the cost of one distributed pass each."""
    e0 = _as_double(emb).select("vec_id", "embedding")
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in sorted(
            e0.where(F.col("vec_id") % centroid_every == 0).collect(),
            key=lambda r: r["vec_id"],
        )[:n_max_centroids]
    ]
    from ..io import widen

    # width 8 A/B'd best (vs none/16/32: 5.0/3.4/3.5/3.5s at sf0.1) —
    # same single-row-group-fixture trade-off as ann_lsh_topk
    e = widen(e0, 8)
    if refine_iters:
        cents = refine_centroids(e, cents, iters=refine_iters)
    if assign_via == "matmul":
        assigned = assign_centroids_matmul(e, cents)
    else:
        best = _nearest_centroid(cents, "embedding")
        assigned = e.select("vec_id", "embedding", best["cid"].alias("cid"))
    q = query_subset(e, every).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probes = (
        q.select("query_id", "q_emb", F.explode(_centroid_sims(cents, "q_emb")).alias("pr"))
        .select("query_id", "q_emb", F.col("pr.cid").alias("cid"), F.col("pr.csim").alias("csim"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("csim").desc(), F.col("cid").asc()
                )
            ),
        )
        .where(F.col("rk") <= nprobe)
        .select("query_id", "q_emb", "cid")
    )
    cands = broadcast(probes).join(assigned, on="cid").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cosine(F.col("q_emb"), F.col("embedding")).alias("sim")
    )
    return _topk(scored, k)


def quantize_embeddings(emb: DataFrame, bits: int = 8) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage scale path
    for a 100TB embedding store (4x smaller than float32, 8x smaller
    than the doubles they'd widen to; dot products on int8 codes are
    also what SIMD-accelerated ANN kernels consume).

    Per vector: scale = max|x| / (2^(bits-1) - 1); code_i =
    floor(x_i/scale + 0.5) (round-half-toward-+inf — one IEEE divide and
    add per element, deterministic across engines, unlike engine round()
    on exact .5 code boundaries, which float32 inputs DO hit since they
    are dyadic rationals). Emits per-vector reconstruction error so a
    pipeline can gate on quality: max_abs_err <= scale/2 by construction
    (asserted in tests), and cosine(x, dequant(x)) stays ~1 at 8 bits.

    All pure JVM HOFs over the array column — no Python, no shuffle:
    a map-only plan that runs at scan speed over any corpus size."""
    qmax = float(2 ** (bits - 1) - 1)
    x = F.col("embedding")
    scale = F.array_max(F.transform(x, lambda v: F.abs(v))).cast("double") / F.lit(
        qmax
    )
    df = emb.select(
        "vec_id",
        "label",
        x.alias("embedding"),
        F.when(scale > 0, scale).otherwise(F.lit(1.0)).alias("scale"),
    )
    codes = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") / F.col("scale") + F.lit(0.5)).cast(
            "int"
        ),
    )
    df = df.withColumn("codes", codes)
    dequant_err = F.array_max(
        F.zip_with(
            F.col("embedding"),
            F.col("codes"),
            lambda v, c: F.abs(v.cast("double") - c * F.col("scale")),
        )
    )
    from ..functions.text import round_half_up

    return df.select(
        "vec_id",
        "label",
        F.size("codes").alias("n_dims"),
        round_half_up(F.col("scale"), 6).alias("scale_r"),
        F.aggregate("codes", F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        round_half_up(dequant_err, 6).alias("max_abs_err"),
    )


def behavioral_similarity(events: DataFrame, k: int = 5) -> DataFrame:
    """Time-series similarity search over activity profiles: for each
    user, the top-k users with the most similar daily event-count
    series (cosine over per-day counts).

    Two formulations exist; the shipped one is chosen by the data's
    density. (a) SPARSE: dot products as an equi-join of (user, day,
    cnt) rows on day — shuffle cost Σ_day |active|^2, the right plan
    when most users are inactive most days. (b) DENSE (this
    implementation): build each user's day-count vector once (map
    lookup over the global day spine, zero-filled) and score with the
    partition-local BLAS matmul path (``cosine_topk_matmul``). The
    fixtures are fully dense — every user active every day — where the
    sparse join degenerates to |users|^2 x |days| pair rows
    (A/B-measured 20.5s vs 1.7s warm at sf0.1's 1500 users). Counts are
    integers, so dots and squared norms are EXACT in float64 (< 2^53)
    — BLAS summation order cannot perturb the result, and the oracle's
    sparse-join formulation produces bit-identical sims.

    At 100TB: a day spine is bounded (years ~ thousands of entries);
    per-user state is one small array. Truly sparse+wide profiles
    (e.g. per-URL instead of per-day) should use formulation (a) —
    it is the same code shape as sim_near_pairs' bucketed join."""
    daily = events.groupBy(
        F.col("user_id"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = daily.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    indexed = daily.join(broadcast(bounds)).select(
        "user_id", F.datediff("day", "d0").alias("i"), "cnt", "span"
    )
    profiles = (
        indexed.groupBy("user_id", "span")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("i", "cnt"))).alias(
                "m"
            )
        )
        .select(
            F.col("user_id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.col("span")),
                lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0))
                .cast("double"),
            ).alias("embedding"),
        )
    )
    out = cosine_topk_matmul(profiles, k=k, every=1)
    return out.select(
        F.col("query_id").alias("user_id"),
        F.col("neighbor_id").alias("similar_user"),
        "rank",
        "sim",
    )
