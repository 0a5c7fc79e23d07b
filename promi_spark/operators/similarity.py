"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, plus an
LSH-bucketed (random hyperplane / SimHash-for-vectors) variant as the
scale path: at 100 TB the bucket join prunes the candidate set to
same-bucket vectors, turning O(N) per query into O(N / 2^bits) with
recall tunable via multi-probe (hamming-adjacent buckets).

Dot products run as ``F.aggregate``/``F.zip_with`` over double arrays —
JVM-side, codegen-fused, no Python. For very wide vectors or big query
batches, swap the kernel for a vectorized Pandas UDF (numpy matmul per
Arrow batch); the plan shape (broadcast queries × scan corpus) stays
the same.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double sum — bit-deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_scores(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine similarity of every row against one query vector
    (broadcast as a literal array). Narrow scan, no shuffle."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return df.select(
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cosine_sim"),
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k. ``orderBy().limit(k)`` is a TakeOrdered
    — per-partition heap + driver merge, no full sort/shuffle. Ties
    broken by id for determinism."""
    return (
        cosine_scores(df, query_vec, id_col, vec_col)
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batch brute-force k-NN: broadcast the (small) query set against
    the corpus scan, rank per query. One shuffle on query_id for the
    ranking window."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        "corpus_id",
        F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes)
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, bits: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, tiny — bits×dim
    floats, broadcast as literals)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector under the hyperplane set."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(_as_double(vec_col), plane) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def ann_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    At scale the corpus is pre-bucketed (a persisted ``bucket`` column,
    partitioned on it) so a query reads one partition — this function
    recomputes buckets inline for self-containedness."""
    import numpy as np

    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    qb = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) > 0:
            qb |= 1 << i
    bucketed = corpus.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    return (
        cosine_scores(
            bucketed.filter(F.col("bucket") == qb), query_vec, id_col, vec_col
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )
