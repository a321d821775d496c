"""Embedding similarity search: brute-force cosine top-k (correctness
baseline) and random-hyperplane LSH bucketing (the scale path).

Driver-mandated extension (BASELINE north star). The embeddings table
carries `embedding: array<float>`; everything below casts to double
element-wise BEFORE any arithmetic so Spark and the DuckDB oracle fold
identical IEEE-754 sequences (left-to-right, 0.0 seed) — results are
bit-reproducible, not just close.

Scale design:
- Brute force broadcasts the (small) query set against the candidate
  scan: one pass, no shuffle of the big side; per-pair cost is one
  fused zip_with/aggregate expression in codegen. At 100 TB you cap
  the query set, not the candidates.
- LSH computes an 8-bit hyperplane-sign bucket per row (pure
  expression, deterministic integer-derived ±1 planes — no stored
  model), then joins query↔candidate per bucket: the join is
  hash-partitioned by bucket so each executor handles a slice of the
  candidate space. Recall < 1 by construction; the brute-force query
  is the recall oracle.
- For very wide vectors, swap the expression dot-product for a
  mapInPandas numpy matmul per partition (same schema contract); the
  expression form is kept because it is engine-native and
  oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with zero-norm guard → 0."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def norm(a: Column) -> Column:
    """Row-level vector norm, for precomputing BEFORE a pairwise join."""
    return _norm(a)


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from precomputed norms — identical arithmetic to
    ``cosine`` (same dot fold, same /(na*nb)), but the O(dim) norm
    folds run once per ROW instead of once per PAIR. Inside an n²
    blocked join this removes 2/3 of the per-pair expression work."""
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def plane_weight(i: int, j: int) -> float:
    """Deterministic pseudo-random ±1 weight for dimension i (1-based),
    plane j — integer arithmetic only, so the oracle reproduces it:
    ((i·2654435761 + j·40503) mod 97) mod 2 → {−1, +1}."""
    return 1.0 if ((i * 2654435761 + j * 40503) % 97) % 2 == 1 else -1.0


def plane_weights(dim: int, n_planes: int = N_PLANES) -> list[list[float]]:
    """Weight matrix, materialized driver-side (the 'model' is a pure
    function of indices — nothing to store or broadcast)."""
    return [
        [plane_weight(i, j) for i in range(1, dim + 1)] for j in range(n_planes)
    ]


def lsh_bucket(emb: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane bucket id: bit j set iff Σᵢ emb[i]·w(i,j) > 0.

    Each projection is one zip_with/aggregate fold against a LITERAL
    weight array — small expression trees (codegen-friendly), no
    stored model, embarrassingly parallel per row."""
    out = F.lit(0)
    for j, weights in enumerate(plane_weights(dim, n_planes)):
        warr = F.array(*[F.lit(w) for w in weights])
        proj = F.aggregate(
            F.zip_with(emb, warr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
    return out


RP_DIM = 32  # reduced dimensionality for the projection shortlist


def rp_weight(i: int, j: int) -> float:
    """Deterministic ±1 sign for input dim i (1-based), output dim j
    (0-based), from md5 of the index pair. md5 (not an affine integer
    recurrence like ``plane_weight``'s) matters here: with
    s(i,j) = f(a·i + b·j mod p) every matrix ROW is a translate of the
    same base sequence — the projections are correlated and recall
    STOPS IMPROVING as out_dim grows (measured on the sf0.01 panel:
    recall@5 stuck at 0.08-0.16 from 8 to 32 dims). Independent md5
    bits restore the Achlioptas iid-sign guarantee: 0.68 at
    (32 dims, 50-candidate shortlist) on the same panel."""
    h = int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:8], 16)
    return 1.0 if h & 1 else -1.0


def rp_matrix(dim: int, out_dim: int = RP_DIM) -> list[list[float]]:
    """Sign projection matrix (Achlioptas, "Database-friendly random
    projections"), materialized driver-side: rows = output dims. A
    pure function of indices — nothing to store or broadcast, and the
    oracle regenerates the identical literals."""
    return [[rp_weight(i, j) for i in range(1, dim + 1)] for j in range(out_dim)]


def rp_project(emb: Column, dim: int, out_dim: int = RP_DIM) -> Column:
    """Dense→reduced projection: out[j] = Σᵢ emb[i]·s(i,j), one
    zip_with/aggregate fold per output dim against a LITERAL sign
    array. Cosine is scale-invariant, so no 1/√d normalization is
    needed. Map-side expression only: at 100 TB the reduction is a
    free rider on the embedding scan, and every downstream pair
    comparison costs out_dim ops instead of dim."""
    cols = []
    for weights in rp_matrix(dim, out_dim):
        warr = F.array(*[F.lit(w) for w in weights])
        cols.append(
            F.aggregate(
                F.zip_with(emb, warr, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*cols)


def ivf_cell_ranks(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Rank IVF cells per vector by round-6 cosine: one broadcast of
    the tiny centroid table (cell, ce, cnrm), one map-side score per
    (vector, cell), one per-vector window — the assignment kernel
    shared by the batch IVF queries (suite/llm.py), the persisted
    index build, and the streaming ingest sink. ``vecs`` must carry
    (vec_id, embedding, nrm); output adds (cell, ccos, crank)."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "nrm",
        "cell",
        F.round(
            cosine_with_norms(
                F.col("embedding"), F.col("ce"), F.col("nrm"), F.col("cnrm")
            ),
            6,
        ).alias("ccos"),
    )
    from pyspark.sql import Window

    wc = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), "cell")
    return scored.withColumn("crank", F.row_number().over(wc))


def hot_block_slice(
    df: DataFrame,
    key_col: str,
    emb_col: str,
    dim: int,
    max_block: int,
    slice_bits: int,
    count_col: str | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Append the bounded-block ``sub`` key: rows whose ``key_col``
    group exceeds ``max_block`` get a ``slice_bits``-wide LSH sub-slice
    + 1, everyone else 0 — so one hot group can never force an
    unbounded n² pair block, and the pair join stays a pure equi-join
    on (key, sub). Group sizes come from a partial-agg groupBy
    BROADCAST back (never a count-over-window partitioned by the
    skewed key). THE single spelling of the blocking rule shared by
    embedding near-dup, semantic dedup, bounded IVF probing, and
    their bounding tests; pass ``count_col`` to keep the group size in
    the output. Pass ``counts`` (a (key_col, __block_n) frame) when
    hotness is defined by a DIFFERENT population than ``df`` — e.g.
    ANN query vectors sliced by the CANDIDATE side's cell sizes, so
    both join sides agree on which blocks are hot. The helper is
    TOTAL: a df key absent from ``counts`` keeps its row with a
    0-count (sub = 0, cold) rather than being silently dropped —
    left join + coalesce, mirrored in the SQL oracles."""
    if counts is None:
        counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__block_n"))
    out = (
        df.join(F.broadcast(counts), key_col, "left")
        .withColumn("__block_n", F.coalesce("__block_n", F.lit(0)))
        .withColumn(
            "sub",
            F.when(
                F.col("__block_n") > max_block,
                lsh_bucket(F.col(emb_col), dim, slice_bits) + 1,
            ).otherwise(F.lit(0)),
        )
    )
    if count_col is None:
        return out.drop("__block_n")
    return out.withColumnRenamed("__block_n", count_col)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded).

    Rank key is (cosine rounded to 6dp DESC, candidate id ASC) so the
    cut is deterministic under float ties and identical to the oracle's
    ordering.
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("q_emb"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = candidates.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("n_emb"),
        norm(F.col(vec_col)).alias("n_nrm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(
            cosine_with_norms(
                F.col("q_emb"), F.col("n_emb"), F.col("q_nrm"), F.col("n_nrm")
            ),
            6,
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def k_center_greedy(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[dict]:
    """Diversity-maximizing coreset selection: the classic k-center
    greedy (Gonzalez / farthest-point traversal) in cosine space —
    the subset-selection step a training-data pipeline runs to pick a
    diverse exemplar set from an embedded corpus.

    Shape: one cached scan; per round, coverage = the quantized max
    cosine of each vector to the centers chosen so far (a pure
    expression over broadcast center literals), and the next center =
    the WORST-covered vector (min cover, ties to min id — computed as
    one ``min(struct(cover, id))`` aggregate, so each round costs ONE
    pass + one pushed-filter point lookup; nothing but 2 scalar rows
    per round reaches the driver). Coverage quantizes to integer
    micro-units before the min/argmax, so selection is deterministic
    under any partitioning. O(n·k) total work, the scale-standard
    greedy (an exact metric k-center is NP-hard; greedy is the 2-approx
    everyone ships).

    Returns [{"k", "center_id", "radius_micro"}]: radius_micro is the
    worst coverage BEFORE adding that round's center (None for the
    seed, which is the min-id vector)."""
    from pyspark import StorageLevel

    base = vectors.select(id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    seed = base.orderBy(id_col).limit(1).collect()[0]
    centers = [(int(seed[id_col]), list(seed[vec_col]))]
    out = [{"k": 1, "center_id": centers[0][0], "radius_micro": None}]

    def cq(center_vec: list) -> F.Column:
        lit = F.array(*[F.lit(float(v)) for v in center_vec])
        return F.round(cosine(F.col(vec_col), lit) * 1e6).cast("bigint")

    for round_no in range(2, k + 1):
        cover = F.greatest(*[cq(v) for _, v in centers]) if len(centers) > 1 \
            else cq(centers[0][1])
        worst = base.agg(
            F.min(F.struct(cover.alias("c"), F.col(id_col).alias("i")))
        ).collect()[0][0]
        nxt = base.filter(F.col(id_col) == worst["i"]).collect()[0]
        centers.append((int(nxt[id_col]), list(nxt[vec_col])))
        out.append(
            {"k": round_no, "center_id": int(nxt[id_col]),
             "radius_micro": int(worst["c"])}
        )
    base.unpersist()
    return out
