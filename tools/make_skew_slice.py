"""Adversarial-skew slices for the r12 skew soak (r11 VERDICT #1).

The sf1/sf10 scale slices are key-shifted sf0.1 replicas — near-uniform
by construction — so no soak before r12 ever stressed the skew regimes
a real 100 TB corpus brings. This tool derives TWO deterministic skew
slices from the uniform sf1 slice:

``skew_hot`` (same row counts as sf1, redistributed):
  - HOT CASE: ~10% of all 1M events reassigned to one existing
    user_id (coin: md5(event_id) % 10 == 0) — a single case/user
    holding 100k events. Stresses every per-case/per-user window
    (W1–W3, DFG, trace_variants, sessionize, rolling windows): the
    windowed family partitions on the case key, so the hot key is one
    straggler task by design.
  - HEAVY-TAILED SOURCE MIX: ~90% of documents reassigned to source
    'src0' (coin: md5(doc_id) % 10 != 0), the rest keep their source
    — the 90/10 regime for temperature/DSIR/mixture/per-source-cap.
  - every other table copied unchanged (FKs intact).

``skew_boiler`` (documents replaced; other tables copied):
  - the 50k original sf1 documents, PLUS
  - BOILERPLATE MEGA-CLUSTER tier A: ``N_CLASSES`` template texts x
    ``COPIES_PER_CLASS`` byte-identical copies (distinct doc_ids) —
    the crawl regime (license headers, nav chrome) the
    exact-signature class collapse exists for: candidate generation
    must stay O(m) per class while the OUTPUT contract (all true
    pairs) is inherently m^2/2 per class.
  - NEAR-VARIANT tier B: ``N_VARIANTS`` distinct one-suffix variants
    of template 0 — near-identical-but-NOT-equal docs whose distinct
    signatures share most MinHash band buckets: the residual-skew
    regime ``max_bucket_size`` (cap counts CLASSES per bucket) and
    AQE skew-join exist for.

Both slices are deterministic (md5 coins, fixed templates — no RNG),
so every artifact built on them is reproducible bit-for-bit and the
DuckDB oracles replay the SAME parquet both engines read.

Usage:
    python tools/make_skew_slice.py [--src /root/repo/.soak/sf1]
                                    [--dst-root /root/repo/.soak]
"""

from __future__ import annotations

import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

N_CLASSES = 200          # tier A: identical-copy boilerplate classes
COPIES_PER_CLASS = 500   # 200 x 500 = 100k docs sharing bands
N_VARIANTS = 2000        # tier B: distinct near-variants of template 0
# Boilerplate doc_ids start far beyond any scale slice's key-shifted id
# space (sf1 documents reach 90,004,999; sf10 ~900M): colliding ids
# made two different TEXTS share one key, and every engine resolves
# that ambiguity differently (the first r12 boiler run's three-way
# pair mismatches were all traced to this, not to the operators).
BOILER_ID_BASE = 10_000_000_000

def template_text(cls: int, n_words: int = 80) -> str:
    """Deterministic 80-word template for class ``cls``. Every word is
    class-prefixed (``w{cls}x{i}`` — pure alnum, one token under the
    engine's tokenizer), so every 3-gram shingle is class-unique and
    cross-class Jaccard is EXACTLY 0: the only near-dup pairs in the
    corpus are the ones the slice plants deliberately (within-class
    copies at J=1, the variant tier at J~0.95). The first build of
    this slice used a shared vocabulary and leaked ~470 cross-class
    near-dup CLASS pairs, each expanding 500x500 member pairs — 146M
    output rows instead of the planted ~28M."""
    return " ".join(f"w{cls}x{i}" for i in range(n_words))


def build_boiler_docs():
    """The boilerplate document rows as a pandas DataFrame."""
    import pandas as pd

    rows = []
    did = BOILER_ID_BASE
    for cls in range(N_CLASSES):
        text = template_text(cls)
        for _ in range(COPIES_PER_CLASS):
            rows.append((did, text, "en", "boiler", len(text)))
            did += 1
    t0 = template_text(0)
    for i in range(N_VARIANTS):
        text = f"{t0} uniq{i} tail{i}"
        rows.append((did, text, "en", "boiler", len(text)))
        did += 1
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def main() -> int:
    import duckdb

    args = sys.argv[1:]

    def opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    src = opt("--src", "/root/repo/.soak/sf1")
    dst_root = opt("--dst-root", "/root/repo/.soak")
    hot_dir = os.path.join(dst_root, "skew_hot")
    boiler_dir = os.path.join(dst_root, "skew_boiler")
    os.makedirs(hot_dir, exist_ok=True)
    os.makedirs(boiler_dir, exist_ok=True)

    con = duckdb.connect()

    def rd(name: str) -> str:
        p = os.path.join(src, f"{name}.parquet")
        return f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else (
            f"read_parquet('{p}')"
        )

    def copy(name: str, dst: str) -> None:
        con.execute(
            f"COPY (SELECT * FROM {rd(name)}) TO "
            f"'{os.path.join(dst, name + '.parquet')}' (FORMAT PARQUET)"
        )

    # ---- skew_hot ----
    hot_user = con.execute(
        f"SELECT min(user_id) FROM {rd('events')}"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT event_id, ts,
                 CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                               || ':hot'), 1, 8)) AS UBIGINT) % 10 = 0
                      THEN {hot_user} ELSE user_id END AS user_id,
                 event_type, value, props
          FROM {rd('events')}
        ) TO '{os.path.join(hot_dir, 'events.parquet')}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang,
                 CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                               || ':mix'), 1, 8)) AS UBIGINT) % 10 != 0
                      THEN 'src0' ELSE source END AS source,
                 n_chars
          FROM {rd('documents')}
        ) TO '{os.path.join(hot_dir, 'documents.parquet')}' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t not in ("events", "documents"):
            copy(t, hot_dir)
    n_hot = con.execute(
        f"SELECT count(*) FROM read_parquet("
        f"'{os.path.join(hot_dir, 'events.parquet')}') "
        f"WHERE user_id = {hot_user}"
    ).fetchone()[0]
    srcmix = con.execute(
        f"SELECT count(*) FILTER (source = 'src0'), count(*) FROM "
        f"read_parquet('{os.path.join(hot_dir, 'documents.parquet')}')"
    ).fetchone()
    print(
        f"skew_hot: hot user {hot_user} holds {n_hot} events; "
        f"src0 holds {srcmix[0]}/{srcmix[1]} docs",
        flush=True,
    )

    # ---- skew_boiler ----
    boiler = build_boiler_docs()  # noqa: F841 (registered by name)
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source, n_chars FROM {rd('documents')}
          UNION ALL
          SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT)
          FROM boiler
        ) TO '{os.path.join(boiler_dir, 'documents.parquet')}'
          (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t != "documents":
            copy(t, boiler_dir)
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet("
        f"'{os.path.join(boiler_dir, 'documents.parquet')}')"
    ).fetchone()[0]
    print(
        f"skew_boiler: {n_docs} docs = 50k originals + "
        f"{N_CLASSES}x{COPIES_PER_CLASS} identical-copy classes + "
        f"{N_VARIANTS} near-variants",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
