"""IVF ANN, embedding near-dup (exact + LSH), winnowing fingerprints."""

import pytest
from pyspark.sql import functions as F


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from promi_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in cosine_topk(corpus, qvec, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(corpus, qvec, k=10, n_clusters=8, nprobe=4).collect()
    ]
    # probing half the clusters must recover a majority of the true top-k
    assert len(set(exact) & set(approx)) >= 5
    # determinism
    again = [
        r["vec_id"]
        for r in ivf_topk(corpus, qvec, k=10, n_clusters=8, nprobe=4).collect()
    ]
    assert approx == again


def test_ivf_assign_partitions_corpus(spark, sf_dir):
    from promi_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = ivf_centroids(emb, n_clusters=8)
    assigned = ivf_assign(emb, cent)
    assert assigned.count() == emb.count()
    clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(8))
    assert len(clusters) >= 2  # k-means actually split the space


def test_lsh_near_dups_subset_of_exact(spark, sf_dir):
    """LSH candidates are verified exactly, so every reported pair must
    appear in the exact all-pairs result with the same similarity."""
    from promi_spark.operators.similarity import cosine_near_dups, lsh_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in cosine_near_dups(emb, threshold=0.3).collect()
    }
    approx = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in lsh_near_dups(emb, threshold=0.3, bits=9, bands=3).collect()
    }
    assert approx  # finds something at this threshold
    assert set(approx) <= set(exact)
    assert all(abs(approx[p] - exact[p]) < 1e-9 for p in approx)
    # high-threshold recall: near-identical vectors agree on sign bits
    assert len(approx) / len(exact) > 0.3


def test_ivf_assign_join_matches_unrolled(spark, sf_dir):
    """The broadcast-join assign (the >128-centroid plan-scale path)
    produces the identical (id -> cluster) map as the unrolled literal
    expression — same sequential dot fold, same ||c||^2 double, same
    lowest-index tie-break — on a 40-centroid seeded-Voronoi codebook."""
    from promi_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = ivf_centroids(emb, n_clusters=40, init="lowest_ids", n_iter=0)
    unrolled = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cent, strategy="unrolled").collect()
    }
    joined = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cent, strategy="join").collect()
    }
    kernel = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cent, strategy="kernel").collect()
    }
    assert unrolled == joined
    assert unrolled == kernel
    assert len(set(joined.values())) > 1


def test_cosine_near_dups_blocked_matches_expression(spark, sf_dir):
    """The blocked numpy kernel (default) is bit-identical to the
    width-agnostic expression variant (block_size=None): the kernel
    accumulates dimension-by-dimension in the fold's IEEE order and
    replays Java's HALF_UP round. Forced multi-block (block_size=64 on
    a 500-vector corpus -> 8 blocks, 36 block pairs) so within-block,
    cross-block, and orientation paths all execute."""
    from promi_spark.operators.similarity import cosine_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    blocked = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in cosine_near_dups(emb, threshold=0.3, block_size=64).collect()
    }
    expr = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in cosine_near_dups(emb, threshold=0.3, block_size=None).collect()
    }
    assert blocked == expr  # exact equality, values included
    assert all(a < b for a, b in blocked)


def test_semantic_dedup_subset_of_exact_with_high_recall(spark, sf_dir):
    """Cluster-bucketed pairs are exact-cosine-verified, so every
    reported pair appears in the all-pairs result with the same
    similarity; and since semantic duplicates co-locate in Voronoi
    cells, recall at a high threshold beats the sign-bit LSH floor."""
    from promi_spark.operators.similarity import (
        cosine_near_dups,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in cosine_near_dups(emb, threshold=0.3).collect()
    }
    clustered = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in semantic_dedup(emb, threshold=0.3, n_clusters=8).collect()
    }
    assert clustered
    assert set(clustered) <= set(exact)
    assert all(abs(clustered[p] - exact[p]) < 1e-9 for p in clustered)
    # pairs are unique by construction (one cluster per vector)
    assert len(clustered) == len(set(clustered))
    # determinism: seeded trainer + deterministic assignment
    again = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in semantic_dedup(emb, threshold=0.3, n_clusters=8).collect()
    }
    assert clustered == again


def test_semantic_dedup_gram_kernel_matches_join_verify(spark, sf_dir):
    """r15: the default per-cluster gram-matrix verify must equal the
    r6-r14 pair-join + Arrow-dot verify EXACTLY — pair set AND rounded
    similarities — including on tie-prone dyadic vectors (exact .5
    rounding digits), NaN-poisoned rows, duplicate vectors, and under a
    forced multi-row-block kernel path."""
    from promi_spark.operators import similarity as S
    from promi_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def run(df, **kw):
        return {
            (r["a"], r["b"]): r["cosine_sim"]
            for r in semantic_dedup(
                df, n_clusters=4, init="lowest_ids", n_iter=0, **kw
            ).collect()
        }

    assert run(emb, threshold=0.3) == run(emb, threshold=0.3, verify="join")

    rows = [
        (0, [0.5, 0.5, 0.25, 0.0]),
        (1, [0.5, 0.5, 0.25, 0.0]),      # duplicate: cosine exactly 1.0
        (2, [1.0, 0.0, 0.0, 0.0]),
        (4, [float("nan"), 1.0, 0.0, 0.0]),
        (5, [-0.5, 0.25, 0.125, 2.0]),
        (6, [2.0, -1.0, 0.5, 0.25]),
        (7, [0.5, 0.5, 0.25, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for thr in (0.0, 0.5, 1.0):
        assert run(df, threshold=thr) == run(df, threshold=thr, verify="join")

    # multi-block kernel path (3-row blocks) is value-identical too
    orig = S._cluster_gram_pairs
    S._cluster_gram_pairs = lambda idf, dim, thr, block_bytes=0: orig(
        idf, dim, thr, block_bytes=8 * len(rows) * 3
    )
    try:
        blocked = run(df, threshold=0.0)
    finally:
        S._cluster_gram_pairs = orig
    assert blocked == run(df, threshold=0.0, verify="join")

    # zero-norm vectors raise on BOTH paths (the session's ANSI
    # divide-by-zero contract on the cosine denominator)
    import pytest

    zdf = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for kw in ({}, {"verify": "join"}):
        with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            semantic_dedup(
                zdf, threshold=0.0, n_clusters=1,
                init="lowest_ids", n_iter=0, **kw
            ).collect()


def test_winnow_shared_fingerprints(spark):
    """Documents sharing a long substring share fingerprints; unrelated
    documents (different alphabets) share none."""
    from promi_spark.operators.text import winnow_fingerprints

    common = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, common + " and then some unique tail one"),
        (2, "prefix text here " + common),
        (3, "zzz qqq xxx vvv www yyy uuu iii ooo ppp mmm nnn bbb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnow_fingerprints(df).collect()
    }
    assert fps[1] & fps[2]  # shared substring -> shared fingerprints
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnow_deterministic_and_bounded(spark, sf_dir):
    from promi_spark.operators.text import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = winnow_fingerprints(docs)
    a = {r["doc_id"]: tuple(r["fingerprints"]) for r in out.collect()}
    b = {r["doc_id"]: tuple(r["fingerprints"]) for r in out.collect()}
    assert a == b
    lens = {r["doc_id"]: len(r["text"]) for r in docs.collect()}
    # winnowing selects ~1/w of positions (upper-bounded by n_windows)
    for did, fp in a.items():
        assert 1 <= len(fp) <= max(lens[did], 2)


def test_mllib_ivf_centroids_drop_in(spark):
    """MLlib-KMeans centroids slot into the same probe plan; the probed
    top-k overlaps heavily with exact brute-force top-k."""
    from promi_spark.io import load_table
    from promi_spark.operators import similarity as sim

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    cent = sim.ivf_centroids_mllib(emb, n_clusters=8, seed=42)
    assert len(cent) == 8 and len(cent[0]) == len(qvec)

    assigned = sim.ivf_assign(emb, cent)
    import numpy as np

    d = ((np.array(cent) - np.array(qvec)[None, :]) ** 2).sum(1)
    probe = [int(i) for i in d.argsort()[:4]]
    approx = (
        sim.cosine_scores(assigned.filter(F.col("cluster").isin(probe)), list(qvec))
        .orderBy(F.desc("cosine_sim"), F.col("vec_id"))
        .limit(10)
    )
    exact = (
        sim.cosine_scores(emb, list(qvec))
        .orderBy(F.desc("cosine_sim"), F.col("vec_id"))
        .limit(10)
    )
    a = {r["vec_id"] for r in approx.collect()}
    e = {r["vec_id"] for r in exact.collect()}
    assert len(a & e) >= 5  # nprobe=4 of 8 clusters: recall well above chance


def test_ivf_indexed_probe_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    """The persisted IVF index must (a) return exactly the same top-k
    as the inline ivf_topk for the same centroids/probe set and (b)
    prune unprobed cluster partitions at the file source
    (PartitionFilters on the scan), which is what bounds a probe to
    nprobe/n_clusters of the corpus at any scale."""
    from promi_spark.operators.similarity import (
        cosine_scores,
        ivf_assign,
        ivf_centroids,
        ivf_topk_indexed,
        write_ivf_index,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = list(
        emb.filter(F.col("vec_id") == 0).first()["embedding"]
    )
    corpus = emb.filter(F.col("vec_id") != 0)
    cent = ivf_centroids(corpus, n_clusters=8, init="lowest_ids", n_iter=0)

    path = str(tmp_path / "ivf_index")
    write_ivf_index(corpus, cent, path)

    got = ivf_topk_indexed(spark, path, qvec, k=10, nprobe=3)
    rows = got.collect()
    assert len(rows) == 10

    # same probe set recomputed inline over the assigned corpus
    import numpy as np
    d = ((np.array(cent) - np.array(qvec)[None, :]) ** 2).sum(1)
    probe = [int(i) for i in d.argsort()[:3]]
    inline = (
        cosine_scores(
            ivf_assign(corpus, cent).filter(F.col("cluster").isin(probe)),
            qvec,
        )
        .orderBy(F.desc("cosine_sim"), F.col("vec_id"))
        .limit(10)
        .collect()
    )
    assert [(r["vec_id"], r["cosine_sim"]) for r in rows] == [
        (r["vec_id"], r["cosine_sim"]) for r in inline
    ]

    # partition pruning is visible in the plan and actually selective
    je = got._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = je.explainString(mode.fromString("formatted"))
    assert "PartitionFilters" in plan and "cluster" in plan
    import re
    m = re.search(r"partitions read: (\d+)", plan)
    if m:  # count printed only post-pruning listing
        assert int(m.group(1)) <= 3


def test_knn_classify_single_shuffle_and_labels(spark, sf_dir):
    """knn_classify: the query_id hash exchange is the ONLY shuffle —
    rank window, vote rollup, and argmax all reuse it — and on a
    corpus with geometrically separated labels every query gets its
    cluster's label."""
    import re

    from pyspark.sql import functions as F

    from promi_spark.operators.similarity import knn_classify

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 20)
    out = knn_classify(corpus, queries, k=10)
    je = out._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = je.explainString(mode.fromString("formatted"))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert out.count() == 20

    # separable case: axis-aligned clusters -> perfect neighbor vote
    rows = []
    for lab, axis in ((0, 0), (1, 1), (2, 2)):
        for i in range(8):
            v = [0.01 * i] * 3
            v[axis] = 1.0
            rows.append((lab * 10 + i, v, lab))
    toy = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    tq = toy.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tc = toy.filter(F.col("vec_id") % 10 != 0)
    preds = {
        r["query_id"]: (r["pred_label"], r["n_votes"])
        for r in knn_classify(tc, tq, k=5).collect()
    }
    assert preds == {0: (0, 5), 10: (1, 5), 20: (2, 5)}


def test_ivf_centroids_default_init_unbiased_by_partition_order(spark):
    """The default (rng_sample) init must draw its k-means sample
    uniformly, not from whichever partitions sort first: on a corpus
    whose FIRST partition holds only cluster-A vectors, the trained
    centroids must still cover cluster B (round-5 VERDICT item — the
    old `.limit(sample)` draw would leave every centroid inside A)."""
    from pyspark.sql import functions as F

    from promi_spark.operators.similarity import ivf_centroids

    n = 4096
    # rows 0..2047 hug (0, 0); rows 2048.. hug (100, 100). A single
    # ascending-id partitioning puts cluster A first, so a first-rows
    # sample of 1024 would see ONLY cluster A.
    df = (
        spark.range(n)
        .withColumn(
            "embedding",
            F.when(
                F.col("id") < n // 2,
                F.array(F.lit(0.0) + F.col("id") % 7 * 0.01, F.lit(0.0)),
            ).otherwise(
                F.array(F.lit(100.0) + F.col("id") % 7 * 0.01, F.lit(100.0))
            ),
        )
        .withColumnRenamed("id", "vec_id")
        .sort("vec_id")
        .coalesce(2)
    )
    cent = ivf_centroids(df, n_clusters=4, n_iter=5, sample=1024)
    xs = [c[0] for c in cent]
    assert any(x < 50 for x in xs), "no centroid near cluster A"
    assert any(x > 50 for x in xs), (
        "no centroid near cluster B — sample was partition-order biased"
    )
    # determinism: same seed, same centroids
    assert cent == ivf_centroids(df, n_clusters=4, n_iter=5, sample=1024)


def test_multiprobe_margin_parity_with_duckdb():
    """ADVICE r7: ann_multiprobe_topk's probe ORDER sorts on |margin|,
    and the oracle replays the margins with DuckDB's
    list_inner_product. Writing this test revealed the two folds are
    ALREADY not bit-identical (DuckDB vectorizes the sum — the margins
    differ in the last ~2 ulps today), so the invariant that actually
    protects the oracle is: (a) the (abs(margin), plane-index) probe
    RANKING is identical across engines for the oracle's own query
    vector (min vec_id), and (b) adjacent |margin| gaps are orders of
    magnitude wider than the measured cross-engine discrepancy, so a
    DuckDB upgrade that further perturbs the fold cannot silently flip
    a near-tie — it would have to move a margin across a gap ~1e6x the
    current discrepancy, and this test fails loudly at the root cause
    first. Plane literals are serialized exactly as oracles._vec
    embeds them in the SQL."""
    import duckdb

    from promi_spark.oracles import _vec
    from promi_spark.queries import _PLANES_ANN6

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        q = con.execute(
            "SELECT CAST(embedding AS DOUBLE[]) FROM read_parquet("
            f"'/root/testdata/{sf}/embeddings.parquet') "
            "ORDER BY vec_id LIMIT 1"
        ).fetchone()[0]
        q = [float(x) for x in q]
        py_margins, duck_margins = [], []
        for p in _PLANES_ANN6:
            # the exact fold multiprobe_buckets.sdot runs
            acc = 0.0
            for x, y in zip(p, q):
                acc += float(x) * float(y)
            py_margins.append(acc)
            duck_margins.append(
                con.execute(
                    "SELECT list_inner_product("
                    f"CAST(? AS DOUBLE[]), {_vec(p)})",
                    [q],
                ).fetchone()[0]
            )
        rank_py = sorted(
            range(len(py_margins)), key=lambda i: (abs(py_margins[i]), i)
        )
        rank_duck = sorted(
            range(len(duck_margins)), key=lambda i: (abs(duck_margins[i]), i)
        )
        assert rank_py == rank_duck, (
            f"{sf}: probe order diverged — DuckDB margins rank "
            f"{rank_duck}, sdot margins rank {rank_py}; "
            "ann_multiprobe_topk's oracle will hash-mismatch"
        )
        # signs must agree too (they define the base bucket itself)
        assert [m > 0 for m in py_margins] == [m > 0 for m in duck_margins]
        disc = max(
            abs(a - b) for a, b in zip(py_margins, duck_margins)
        )
        abs_sorted = sorted(abs(m) for m in py_margins)
        min_gap = min(
            b - a for a, b in zip(abs_sorted, abs_sorted[1:])
        )
        assert min_gap > 1e6 * max(disc, 1e-18), (
            f"{sf}: adjacent |margin| gap {min_gap:g} is within reach of "
            f"the cross-engine fold discrepancy {disc:g} — the probe "
            "order is now tie-fragile; re-anchor the oracle margins"
        )


def test_ivf_topk_auto_geometry_end_to_end(spark, sf_dir):
    """n_clusters='auto'/nprobe='auto' wire ivf_geometry through the
    operator. On a corpus small enough that the occupancy rule probes
    every cell (sf0.001: ~50 vectors -> 7 cells, 7 probes), the auto
    config must degrade gracefully to EXACT top-k — the documented
    small-corpus behavior of the rule."""
    from promi_spark.operators.similarity import (
        cosine_topk,
        ivf_geometry,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    cells, probes = ivf_geometry(n)
    qvec = list(emb.orderBy("vec_id").first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    approx = [
        r["vec_id"]
        for r in ivf_topk(
            corpus, qvec, k=10, n_clusters="auto", nprobe="auto"
        ).collect()
    ]
    assert len(approx) == 10
    if probes == cells:  # full scan -> must equal brute force exactly
        exact = [r["vec_id"] for r in cosine_topk(corpus, qvec, k=10).collect()]
        assert approx == exact
    # determinism
    again = [
        r["vec_id"]
        for r in ivf_topk(
            corpus, qvec, k=10, n_clusters="auto", nprobe="auto"
        ).collect()
    ]
    assert approx == again


def test_semantic_dedup_auto_cluster_count(spark, sf_dir):
    """n_clusters='auto' executes the documented N/target_cluster_size
    rule (the sizing that keeps within-cluster verify ~linear in N);
    it must equal the explicitly computed count, pair for pair."""
    from promi_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    explicit_k = max(1, -(-n // 10))
    auto = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in semantic_dedup(
            emb, threshold=0.3, n_clusters="auto", target_cluster_size=10
        ).collect()
    }
    explicit = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in semantic_dedup(
            emb, threshold=0.3, n_clusters=explicit_k
        ).collect()
    }
    assert auto == explicit
    assert auto  # found pairs at this threshold


def test_cosine_near_dups_quadratic_guard(spark, sf_dir, monkeypatch):
    """The exact all-pairs baseline refuses oversized inputs unless the
    caller opts in — a pipeline cannot reach the O(N^2) plan by
    accident (VERDICT r10 'what's wrong' #1)."""
    import promi_spark.operators.similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    monkeypatch.setattr(S, "QUADRATIC_ROW_CEILING", 10)
    with pytest.raises(ValueError, match="all-pairs ceiling"):
        S.cosine_near_dups(emb, threshold=0.9).count()
    # the explicit override still runs, and the expression variant is
    # guarded identically
    assert S.cosine_near_dups(
        emb.limit(12), threshold=-1.0, allow_quadratic=True
    ).count() == 12 * 11 // 2
    with pytest.raises(ValueError, match="all-pairs ceiling"):
        S.cosine_near_dups(emb, threshold=0.9, block_size=None).count()
