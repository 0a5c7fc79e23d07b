"""Learned document-quality classification (fastText-style, on MLlib).

Production pretraining pipelines pair the heuristic quality signals
(``operators.text.quality_scores``) with a LEARNED filter: a linear
classifier over hashed bag-of-ngram features scoring "does this look
like reference-quality text" (the public fastText-classifier recipe
used by GPT-3/LLaMA-class data pipelines: hashed unigrams+bigrams,
logistic loss). This module provides that layer Spark-first:

- features are ``HashingTF`` sparse vectors built JVM-side (no Python
  in the loop), unigrams + bigrams hashed into one fixed-width space,
  so the model is a dense coefficient vector independent of vocabulary;
- training is MLlib ``LogisticRegression`` (distributed L-BFGS — each
  iteration is one treeAggregate over the corpus, no driver-side data);
- scoring is ``model.transform`` — a narrow per-row pass whose cost is
  one sparse dot product, broadcast-weight, shuffle-free;
- ``weak_quality_labels`` bootstraps supervision from the heuristic
  signals when no curated positive corpus exists (the usual cold-start:
  label clean-looking docs 1, obviously-junk docs 0, leave the
  ambiguous middle out of the training set).

At 100 TB: training runs on a SAMPLE (a linear model saturates long
before the full corpus; pass ``train_fraction``), scoring runs on
everything and is embarrassingly parallel. The learned probabilities
are not bit-portable across engines (float reduction order inside
L-BFGS), so the query surface registers rows-only — the behavior
contract lives in tests (separation on held-out synthetic corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "weak_quality_labels",
    "train_quality_classifier",
    "score_quality",
    "topic_clusters",
    "cluster_profile",
]


def weak_quality_labels(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.12,
    min_stopword_ratio: float = 0.02,
) -> DataFrame:
    """Heuristic weak supervision: 1 = passes every clean-text signal,
    0 = fails the junk signals outright; rows in between are dropped
    (ambiguous docs poison a weak-label fit). Thresholds mirror the
    Gopher-style rule set in the declarative cleaning pipeline."""
    from promi_spark.operators.text import quality_scores

    q = quality_scores(df, text_col=text_col)
    labeled = df.join(q.select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio"), "doc_id")
    is_good = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )
    is_junk = (
        (F.col("n_tokens") < min_tokens / 2)
        | (F.col("punct_ratio") > 2 * max_punct_ratio)
    )
    return (
        labeled.withColumn(
            "label",
            F.when(is_good, F.lit(1.0)).when(is_junk, F.lit(0.0)),
        )
        .filter(F.col("label").isNotNull())
        .drop("n_tokens", "punct_ratio", "stopword_ratio")
    )


def _feature_pipeline(text_col: str, num_features: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+", toLowercase=True
    )
    bi = NGram(n=2, inputCol="__toks", outputCol="__bigrams")
    # Two hash spaces assembled side by side — a bigram can never
    # collide into a unigram bucket, mirroring fastText's separate
    # word/ngram tables.
    tf1 = HashingTF(
        inputCol="__toks", outputCol="__f1", numFeatures=num_features, binary=True
    )
    tf2 = HashingTF(
        inputCol="__bigrams", outputCol="__f2", numFeatures=num_features, binary=True
    )
    asm = VectorAssembler(inputCols=["__f1", "__f2"], outputCol="__features")
    return Pipeline(stages=[tok, bi, tf1, tf2, asm])


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_features: int = 2**18,
    reg: float = 1e-4,
    max_iter: int = 50,
    train_fraction: float | None = None,
    seed: int = 0,
):
    """Fit the hashed-ngram logistic model; returns a ``PipelineModel``
    whose ``transform`` adds ``probability``/``prediction``. All stages
    are JVM-side; the only iteration state is the coefficient vector
    (``2 * num_features`` doubles, ~4 MB at the default width)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    if train_fraction is not None:
        df = df.sample(train_fraction, seed=seed)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg,
        elasticNetParam=0.0,
        maxIter=max_iter,
        standardization=False,
    )
    feats = _feature_pipeline(text_col, num_features)
    return Pipeline(stages=[feats, lr]).fit(df)


def score_quality(
    model, df: DataFrame, text_col: str = "text", out_col: str = "quality_prob"
) -> DataFrame:
    """Score every document: P(label=1). Narrow per-row transform —
    the coefficient vector rides the closure to executors; no shuffle,
    no Python UDF."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    keep = [c for c in df.columns]
    return scored.select(
        *keep, vector_to_array("probability").getItem(1).alias(out_col)
    )


def topic_clusters(
    df: DataFrame,
    k: int = 16,
    num_features: int = 2**16,
    seed: int = 0,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus map: assign every document to one of ``k`` content
    clusters — hashed-TF vectors, L2-normalized (so k-means distance is
    a cosine proxy), distributed MLlib k-means. The curation view a
    pretraining pipeline uses to see WHAT is in a crawl, spot
    over-represented content families, and set per-cluster sampling
    weights (the clustering half of the SemDeDup recipe, here exposed
    as its own operator).

    All stages JVM-side; training state is k dense centroids
    (``k * num_features`` doubles at worst, sparse in practice).
    Returns (key_col, cluster)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import HashingTF, Normalizer, RegexTokenizer

    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__toks", outputCol="__tf", numFeatures=num_features
            ),
            Normalizer(inputCol="__tf", outputCol="__features", p=2.0),
            KMeans(
                featuresCol="__features", predictionCol="cluster", k=k,
                seed=seed,
            ),
        ]
    )
    model = pipe.fit(df)
    return model.transform(df).select(key_col, "cluster")


def cluster_profile(
    df: DataFrame,
    assignments: DataFrame,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-cluster curation profile: doc count, corpus share, mean doc
    length, and the dominant source — one join on the doc key, one
    map-side-combined rollup, a window over the (k-row) aggregate for
    shares and the per-cluster top source."""
    from pyspark.sql import Window

    joined = df.join(assignments, key_col)
    per_src = (
        joined.groupBy("cluster", "source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
        )
    )
    w = Window.partitionBy("cluster")
    ranked = per_src.select(
        "cluster",
        "n",
        "chars",
        F.row_number()
        .over(w.orderBy(F.col("n").desc(), "source"))
        .alias("rk"),
        F.first("source").over(w.orderBy(F.col("n").desc(), "source")).alias(
            "top_source"
        ),
        F.sum("n").over(w).alias("n_docs"),
        F.sum("chars").over(w).alias("cluster_chars"),
    ).filter(F.col("rk") == 1)
    total = Window.partitionBy()
    return ranked.select(
        "cluster",
        F.col("n_docs").alias("n_docs"),
        F.round(F.col("n_docs") / F.sum("n_docs").over(total), 4).alias("share"),
        F.round(F.col("cluster_chars") / F.col("n_docs"), 1).alias("mean_chars"),
        "top_source",
    )
