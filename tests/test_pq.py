"""Product quantization (operators/pq.py) and prototype cluster
pruning (similarity.cluster_prune): quantization exactness on codebook
members, ADC semantics, partition invariance, pruning contracts,
plan shapes."""

import math
import re

import pytest
from pyspark.sql import functions as F

from promi_spark.operators import pq


def _lip(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_codebooks(
        emb, dim=64, m_subspaces=4, n_codes=16, init="lowest_ids", n_iter=0
    )


def test_codebook_geometry(emb, books):
    assert len(books) == 4
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 16 for b in books for c in b)
    with pytest.raises(ValueError):
        pq.pq_codebooks(emb, dim=64, m_subspaces=5)


def test_lowest_ids_codebooks_are_seed_subvectors(emb, books):
    seeds = emb.orderBy("vec_id").limit(16).collect()
    for m in range(4):
        for c, row in zip(books[m], seeds):
            assert c == [float(x) for x in row["embedding"][m * 16 : (m + 1) * 16]]


def test_encode_codes_in_range_and_partition_invariant(emb, books):
    enc = pq.pq_encode(emb, books)
    rows = {r["vec_id"]: [r[f"code_{m}"] for m in range(4)] for r in enc.collect()}
    assert all(0 <= c < 16 for codes in rows.values() for c in codes)
    enc2 = pq.pq_encode(emb.repartition(13), books)
    rows2 = {r["vec_id"]: [r[f"code_{m}"] for m in range(4)] for r in enc2.collect()}
    assert rows == rows2


def test_encode_is_exact_on_codebook_members(emb, books):
    """A vector that IS a codebook seed must encode to its own code in
    every subspace (zero quantization error)."""
    seed_ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(16).collect()]
    enc = pq.pq_encode(emb.filter(F.col("vec_id").isin(seed_ids)), books)
    for r in enc.collect():
        expect = seed_ids.index(r["vec_id"])
        for m in range(4):
            # ties (duplicate sub-vectors) resolve to the LOWEST code,
            # so the code's centroid must equal the seed's sub-vector
            assert books[m][r[f"code_{m}"]] == books[m][expect]


def test_adc_exact_on_codebook_members(emb, books):
    """For a corpus row equal to a codebook seed, ADC == the true
    squared L2 distance to the query (quantization error is zero)."""
    rows = emb.orderBy("vec_id").limit(17).collect()
    qvec = [float(x) for x in rows[16]["embedding"]]
    seed0 = [float(x) for x in rows[0]["embedding"]]
    out = {
        r["vec_id"]: r["adc_dist"]
        for r in pq.pq_topk(
            emb.filter(F.col("vec_id") < 16), books, qvec, k=16
        ).collect()
    }
    diff = [q - s for q, s in zip(qvec, seed0)]
    true_d2 = _lip(diff, diff)
    assert math.isclose(out[rows[0]["vec_id"]], true_d2, rel_tol=1e-5)


def test_pq_topk_codes_path_matches_inline(emb, books):
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corp = emb.filter(F.col("vec_id") > 0)
    inline = pq.pq_topk(corp, books, qvec, k=10).collect()
    codes = pq.pq_encode(corp, books)
    via_codes = pq.pq_topk(corp, books, qvec, k=10, codes=codes).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in inline] == [
        (r["vec_id"], r["adc_dist"]) for r in via_codes
    ]


def test_pq_kmeans_books_reduce_distortion(emb):
    """Trained codebooks must reconstruct better than the arbitrary
    seeded ones: mean quantization distortion E||x - decode(encode(x))||^2
    (the objective Lloyd iterations minimize) over the whole corpus."""
    import numpy as np

    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=float
    )

    def distortion(init, n_iter):
        bks = pq.pq_codebooks(
            emb, dim=64, m_subspaces=4, n_codes=16, init=init, n_iter=n_iter
        )
        total = 0.0
        for m, book in enumerate(bks):
            Xm = X[:, m * 16 : (m + 1) * 16]
            C = np.array(book)
            d = ((Xm[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            total += d.min(1).sum()
        return total / len(X)

    assert distortion("kmeans", 10) <= distortion("lowest_ids", 0) * 1.01


def test_pq_plan_is_codegen_takeordered(emb, books):
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    plan = (
        pq.pq_topk(emb, books, qvec, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # scan + per-partition heaps only


def test_pq_param_validation(emb, books):
    with pytest.raises(ValueError):
        pq.pq_topk(emb, books, [0.0] * 64, k=0)


# ---- cluster_prune ---------------------------------------------------------


def test_cluster_prune_keeps_tail_not_core(spark, sf_dir):
    from promi_spark.operators.similarity import cluster_prune, ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = ivf_centroids(emb, 8, init="lowest_ids", n_iter=0)
    kept = cluster_prune(
        emb, frac=0.3, n_clusters=8, init="lowest_ids", n_iter=0
    )
    kept_ids = {r["vec_id"] for r in kept.collect()}
    n = emb.count()
    # global bound: ceil per cluster, so kept <= n - sum(ceil(0.3 * c))
    assigned = ivf_assign(emb, cent)
    sizes = [r["cnt"] for r in assigned.groupBy("cluster").agg(F.count("*").alias("cnt")).collect()]
    expect_kept = sum(c - math.ceil(0.3 * c) for c in sizes)
    assert len(kept_ids) == expect_kept
    # the kept set carries every cluster's FARTHEST member and never
    # its closest (for clusters of >= 2 rows)
    import numpy as np

    C = np.array(cent)
    rows = emb.collect()
    by_cluster = {}
    for r in rows:
        v = np.array(r["embedding"], dtype=float)
        scores = 2 * C @ v - (C * C).sum(1)
        c = int(scores.argmax())
        d2 = float(v @ v - scores.max())
        by_cluster.setdefault(c, []).append((d2, r["vec_id"]))
    for c, members in by_cluster.items():
        if len(members) < 2:
            continue
        members.sort()
        assert members[-1][1] in kept_ids  # farthest kept
        assert members[0][1] not in kept_ids  # most prototypical dropped


def test_cluster_prune_frac_zero_keeps_everything(spark, sf_dir):
    from promi_spark.operators.similarity import cluster_prune

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = cluster_prune(emb, frac=0.0, n_clusters=4, init="lowest_ids", n_iter=0)
    assert kept.count() == emb.count()
    with pytest.raises(ValueError):
        cluster_prune(emb, frac=1.0)


def test_cluster_prune_partition_invariant(spark, sf_dir):
    from promi_spark.operators.similarity import cluster_prune

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {r["vec_id"] for r in cluster_prune(emb, 0.25, 8, init="lowest_ids", n_iter=0).collect()}
    b = {
        r["vec_id"]
        for r in cluster_prune(
            emb.repartition(17), 0.25, 8, init="lowest_ids", n_iter=0
        ).collect()
    }
    assert a == b


def test_pq_index_persist_roundtrip(spark, emb, books, tmp_path):
    """write_pq_index persists only the code table (+ codebook
    sidecar); a query over the loaded index matches the inline path
    and never scans raw vectors."""
    from promi_spark.operators.pq import pq_topk, read_pq_index, write_pq_index

    path = str(tmp_path / "pq_idx")
    write_pq_index(emb, books, path)
    codes, books2 = read_pq_index(spark, path)
    assert books2 == books
    assert set(codes.columns) == {"vec_id", "code_0", "code_1", "code_2", "code_3"}
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    via_idx = pq_topk(None, books2, qvec, k=10, codes=codes).collect()
    inline = pq_topk(emb, books, qvec, k=10).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in via_idx] == [
        (r["vec_id"], r["adc_dist"]) for r in inline
    ]


def test_ivfpq_full_probe_equals_pq(spark, emb, books):
    """Probing EVERY cell degenerates IVF-PQ to the plain ADC scan —
    the composition adds cell pruning and nothing else."""
    from promi_spark.operators.pq import ivfpq_topk, pq_topk
    from promi_spark.operators.similarity import ivf_centroids

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corp = emb.filter(F.col("vec_id") > 0)
    cents = ivf_centroids(corp, 8, init="lowest_ids", n_iter=0)
    full = ivfpq_topk(corp, cents, books, qvec, k=10, nprobe=8).collect()
    plain = pq_topk(corp, books, qvec, k=10).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in full] == [
        (r["vec_id"], r["adc_dist"]) for r in plain
    ]


def test_ivfpq_scans_only_probed_cells(spark, emb, books):
    """nprobe=1 results are a subset of the queried cell's members and
    ADC values agree with the plain scan row-for-row."""
    from promi_spark.operators.pq import ivfpq_topk, pq_topk
    from promi_spark.operators.similarity import ivf_assign, ivf_centroids

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corp = emb.filter(F.col("vec_id") > 0)
    cents = ivf_centroids(corp, 8, init="lowest_ids", n_iter=0)
    out = ivfpq_topk(corp, cents, books, qvec, k=50, nprobe=1).collect()
    assert out, "probed cell must hold at least one vector"
    members_by_id = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(corp, cents).select("vec_id", "cluster").collect()
    }
    cells = {members_by_id[r["vec_id"]] for r in out}
    assert len(cells) == 1  # exactly the probed cell
    plain = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_topk(corp, books, qvec, k=corp.count()).collect()
    }
    for r in out:
        assert r["adc_dist"] == plain[r["vec_id"]]
    with pytest.raises(ValueError):
        ivfpq_topk(corp, cents, books, qvec, nprobe=0)


def test_pq_rerank_candidates_all_equals_exact(spark, emb, books):
    """With the candidate pool covering the whole corpus, rerank IS the
    exact kNN — ADC only orders the pool, never drops a neighbor."""
    import numpy as np

    from promi_spark.operators.pq import pq_rerank_topk

    rows = emb.orderBy("vec_id").collect()
    qvec = [float(x) for x in rows[0]["embedding"]]
    corp = emb.filter(F.col("vec_id") > rows[0]["vec_id"])
    n = corp.count()
    got = [
        (r["vec_id"], r["l2_dist"])
        for r in pq_rerank_topk(corp, books, qvec, k=10, n_candidates=n).collect()
    ]
    q = np.array(qvec)
    exact = sorted(
        (
            round(float(((np.array(r["embedding"], dtype=float) - q) ** 2).sum()), 6),
            r["vec_id"],
        )
        for r in rows[1:]
    )[:10]
    assert got == [(vid, d) for d, vid in exact]


def test_pq_rerank_recall_beats_raw_adc(spark, emb, books):
    """The production posture: rerank@(pool=100) recovers more of the
    exact top-10 than raw ADC top-10 (and its distances are exact)."""
    import numpy as np

    from promi_spark.operators.pq import pq_rerank_topk, pq_topk

    rows = emb.orderBy("vec_id").collect()
    qvec = [float(x) for x in rows[0]["embedding"]]
    corp = emb.filter(F.col("vec_id") > rows[0]["vec_id"])
    q = np.array(qvec)
    exact = {
        vid
        for _, vid in sorted(
            (float(((np.array(r["embedding"], dtype=float) - q) ** 2).sum()), r["vec_id"])
            for r in rows[1:]
        )[:10]
    }
    adc = {r["vec_id"] for r in pq_topk(corp, books, qvec, k=10).collect()}
    rr = {
        r["vec_id"]
        for r in pq_rerank_topk(corp, books, qvec, k=10, n_candidates=100).collect()
    }
    assert len(rr & exact) >= len(adc & exact)
    with pytest.raises(ValueError):
        pq_rerank_topk(corp, books, qvec, k=10, n_candidates=5)


def test_ivfpq_codes_path_matches_inline(spark, emb, books):
    """ivfpq_topk with a precomputed pq_encode table (the ADVICE-plumbed
    ``codes`` option) returns the same ranked rows as the inline-encode
    path — the code table only changes WHERE the codes come from."""
    from promi_spark.operators.pq import ivfpq_topk, pq_encode
    from promi_spark.operators.similarity import ivf_centroids

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corp = emb.filter(F.col("vec_id") > 0)
    cents = ivf_centroids(corp, 8, init="lowest_ids", n_iter=0)
    codes = pq_encode(corp, books)
    via_codes = ivfpq_topk(
        corp, cents, books, qvec, k=10, nprobe=3, codes=codes
    ).collect()
    inline = ivfpq_topk(corp, cents, books, qvec, k=10, nprobe=3).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in via_codes] == [
        (r["vec_id"], r["adc_dist"]) for r in inline
    ]


def test_ivfpq_index_serving_path(spark, emb, books, tmp_path):
    """The end-to-end persisted IVF-PQ layout: write_ivfpq_index lays
    codes out as cluster=N partition directories with both quantizer
    sidecars (and no raw vector column), and ivfpq_topk_indexed answers
    from disk with the SAME rows as the in-memory composition while the
    scan plan prunes to the probed cells (PartitionFilters, no
    PushedFilters on data columns needed)."""
    import os

    from promi_spark.operators.pq import (
        _probe_cells,
        ivfpq_topk,
        ivfpq_topk_indexed,
        write_ivfpq_index,
    )
    from promi_spark.operators.similarity import ivf_centroids
    from tests.test_plan_shapes import explain

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corp = emb.filter(F.col("vec_id") > 0)
    cents = ivf_centroids(corp, 8, init="lowest_ids", n_iter=0)
    path = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(corp, cents, books, path)

    entries = os.listdir(path)
    cell_dirs = [e for e in entries if e.startswith("cluster=")]
    assert cell_dirs, "index must be partitioned by cluster"
    assert "_centroids.json" in entries and "_codebooks.json" in entries
    stored = spark.read.parquet(path)
    assert "embedding" not in stored.columns  # raw vectors NOT written
    assert set(stored.columns) == {
        "vec_id", "code_0", "code_1", "code_2", "code_3", "cluster"
    }

    got = ivfpq_topk_indexed(spark, path, qvec, k=10, nprobe=3)
    mem = ivfpq_topk(corp, cents, books, qvec, k=10, nprobe=3).collect()
    plan = explain(got)
    probes = _probe_cells(qvec, cents, 3)
    # partition pruning is visible in the plan: the scan's
    # PartitionFilters carries the probed-cell IN-list, and only those
    # cells' directories are read
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "cluster" in m.group(1)
    for c in probes:
        assert str(c) in m.group(1)
    assert [(r["vec_id"], r["adc_dist"]) for r in got.collect()] == [
        (r["vec_id"], r["adc_dist"]) for r in mem
    ]
