"""Learned quality classifier (hashed-ngram logistic model)."""

import pytest
from pyspark.sql import functions as F

from promi_spark.operators.ml import (
    score_quality,
    train_quality_classifier,
    weak_quality_labels,
)

GOOD = [
    "the committee published its findings after a thorough review of the evidence and the report was widely discussed",
    "researchers at the university demonstrated that the new method improves accuracy while reducing the overall cost of training models",
    "in the novel the protagonist travels through the countryside and reflects on the meaning of memory and loss",
    "the recipe calls for two cups of flour a pinch of salt and the juice of one lemon stirred gently",
    "historians have long debated the causes of the conflict and the archive offers new evidence about the period",
]
JUNK = [
    "click here!!! $$$ win now $$$ !!!",
    "aaa bbb",
    "@@@@ #### %%%% **** ???? !!!!",
    "buy buy buy cheap cheap cheap",
    "x",
]


def _corpus(spark, reps: int = 6):
    rows = []
    i = 0
    for r in range(reps):
        for t in GOOD:
            rows.append((i, t + f" variant {r}"))
            i += 1
        for t in JUNK:
            rows.append((i, t))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_classifier_separates_good_from_junk(spark):
    docs = _corpus(spark)
    labeled = docs.withColumn(
        "label", F.when(F.col("doc_id") % 10 < 5, 1.0).otherwise(0.0)
    )
    model = train_quality_classifier(labeled, num_features=2**12)
    holdout = spark.createDataFrame(
        [
            # in-distribution paraphrase of a training family
            (1000, "the committee published its findings after a careful review of the evidence and the report was discussed widely"),
            # out-of-family clean prose (harder: only shared stopwords)
            (1001, "the council reviewed the proposal and the members agreed on the findings of the report"),
            (1002, "$$$ !!! click click click $$$"),
        ],
        "doc_id long, text string",
    )
    probs = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, holdout).collect()}
    assert probs[1000] > 0.7, probs
    assert probs[1001] > 50 * probs[1002], probs  # ranked separation
    assert probs[1002] < 0.05, probs


def test_weak_labels_bootstrap_and_score(spark):
    """Cold-start path: heuristic weak labels -> train -> score the full
    corpus. Weak labels must agree with the construction, and the
    learned scores must preserve the separation."""
    docs = _corpus(spark)
    weak = weak_quality_labels(docs)
    by_label = {
        r["label"]: r["n"]
        for r in weak.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert by_label.get(1.0, 0) >= 25 and by_label.get(0.0, 0) >= 25
    # every GOOD doc labeled 1, every labeled-0 doc is from JUNK
    good_ids = {r["doc_id"] for r in weak.filter("label = 1.0").collect()}
    assert all(i % 10 < 5 for i in good_ids)

    model = train_quality_classifier(weak, num_features=2**12)
    scored = score_quality(model, docs)
    means = {
        r["grp"]: r["m"]
        for r in scored.withColumn("grp", F.col("doc_id") % 10 < 5)
        .groupBy("grp")
        .agg(F.avg("quality_prob").alias("m"))
        .collect()
    }
    assert means[True] - means[False] > 0.5, means


def test_score_preserves_input_columns(spark):
    docs = _corpus(spark, reps=2)
    labeled = docs.withColumn(
        "label", F.when(F.col("doc_id") % 10 < 5, 1.0).otherwise(0.0)
    )
    model = train_quality_classifier(labeled, num_features=2**10, max_iter=10)
    out = score_quality(model, docs)
    assert out.columns == ["doc_id", "text", "quality_prob"]
    assert out.count() == docs.count()


def test_model_save_load_scores_identically(spark, tmp_path):
    """The fitted PipelineModel persists with MLlib's native writer and
    reloads to bit-identical scores — the handoff contract between the
    training job and the (separate) corpus-scoring job."""
    from pyspark.ml import PipelineModel

    docs = _corpus(spark, reps=2)
    labeled = docs.withColumn(
        "label", F.when(F.col("doc_id") % 10 < 5, 1.0).otherwise(0.0)
    )
    model = train_quality_classifier(labeled, num_features=2**10, max_iter=10)
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, docs).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(reloaded, docs).collect()}
    assert a == b


def test_topic_clusters_separate_vocabularies(spark):
    """Two disjoint vocabularies land in different clusters; the
    profile accounts for every document."""
    from promi_spark.operators.ml import cluster_profile, topic_clusters

    rows = []
    for i in range(20):
        rows.append((i, f"python spark cluster shuffle partition job {i%3}", "code"))
    for i in range(20, 40):
        rows.append((i, f"recipe flour sugar butter oven bake whisk {i%3}", "food"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    assign = topic_clusters(docs, k=2, num_features=2**12, seed=7)
    got = {r["doc_id"]: r["cluster"] for r in assign.collect()}
    code = {got[i] for i in range(20)}
    food = {got[i] for i in range(20, 40)}
    assert len(code) == 1 and len(food) == 1 and code != food
    prof = cluster_profile(docs, assign).collect()
    assert sum(r["n_docs"] for r in prof) == 40
    assert {r["top_source"] for r in prof} == {"code", "food"}
    assert abs(sum(r["share"] for r in prof) - 1.0) < 1e-6
