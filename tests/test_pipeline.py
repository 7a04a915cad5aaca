"""Training-data pipeline correctness: dedup / similarity / text stats.

Strategy mirrors the reference's exact-expected-value asserts (SURVEY.md §5):
every approximate operator (MinHash, SimHash, IVF) is checked against an
exact brute-force computation on the same small corpus.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.pipeline import dedup, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _exact_jaccard(a: str, b: str, n: int = 5) -> float:
    def sh(t):
        t = t.lower()
        if len(t) <= n:
            return {t}
        return {t[i : i + n] for i in range(len(t) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_exact_dedup_removes_only_duplicates(spark, docs):
    pdf = docs.toPandas()
    n_unique = pdf["text"].nunique()
    kept = dedup.exact_dedup(docs, "text", "doc_id")
    assert kept.count() == n_unique
    # keeper is the min key of each text group
    keep_keys = set(r["doc_id"] for r in kept.select("doc_id").collect())
    expected = set(pdf.groupby("text")["doc_id"].min())
    assert keep_keys == expected


def test_minhash_estimates_match_exact_jaccard(spark, docs):
    """Estimated Jaccard within 0.25 of exact for LSH candidate pairs, and
    high-similarity pairs (>= 0.9 exact) must be caught by LSH."""
    small = docs.where(F.col("doc_id") < 120)
    sig = dedup.minhash_signatures(small, "text", "doc_id", num_hashes=64)
    cand = dedup.minhash_lsh_candidates(sig, bands=16, rows_per_band=4)
    est = dedup.minhash_jaccard_estimate(sig, cand).toPandas()
    texts = {r["doc_id"]: r["text"] for r in small.collect()}
    for r in est.itertuples():
        exact = _exact_jaccard(texts[r.key_a], texts[r.key_b])
        assert abs(r.jaccard_est - exact) < 0.25, (r.key_a, r.key_b)
    # recall on near-exact duplicates
    keys = sorted(texts)
    exact_dups = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if _exact_jaccard(texts[a], texts[b]) >= 0.9
    }
    got_pairs = {(r.key_a, r.key_b) for r in est.itertuples()}
    assert exact_dups <= got_pairs


def test_simhash_hamming_is_exact(spark, docs):
    sig = dedup.simhash_signatures(docs.where(F.col("doc_id") < 80), "text", "doc_id")
    pairs = dedup.simhash_near_dups(sig, hamming_radius=10, tables=4).toPandas()
    sig_map = {r["key"]: r["simhash"] for r in sig.collect()}
    for r in pairs.itertuples():
        want = bin((sig_map[r.key_a] ^ sig_map[r.key_b]) & ((1 << 64) - 1)).count("1")
        assert r.hamming == want


def test_ngram_jaccard_matches_python(spark, docs):
    small = docs.where(F.col("doc_id") < 40)
    pairs = (
        small.select(F.col("doc_id").alias("key_a"))
        .crossJoin(small.select(F.col("doc_id").alias("key_b")))
        .where(F.col("key_a") < F.col("key_b"))
    )
    got = dedup.ngram_jaccard_pairs(small, "text", "doc_id", pairs).toPandas()
    texts = {r["doc_id"]: r["text"] for r in small.collect()}
    for r in got.itertuples():
        assert abs(r.jaccard - _exact_jaccard(texts[r.key_a], texts[r.key_b])) < 1e-9


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    keys = np.array([r["vec_id"] for r in rows])
    q = mat[keys.tolist().index(7)]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((keys, -np.round(cos, 12)))[:10]
    want = [(int(keys[i]), round(float(cos[i]), 6)) for i in order]
    got = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
    ]
    assert got == want


def test_ivf_topk_recall(spark, emb):
    """IVF multi-probe must recover >= 7 of exact top-10."""
    q = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
    }
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, "embedding", "vec_id", q, k=10, bits=6, probe_hamming=2
        ).collect()
    }
    assert len(exact & approx) >= 7


def test_token_count_matches_python(spark, docs):
    got = textstats.token_count(docs).select("doc_id", "ws_tokens").toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    want = {
        r.doc_id: len([t for t in r.text.split() if t]) for r in pdf.itertuples()
    }
    for r in got.itertuples():
        assert r.ws_tokens == want[r.doc_id]


def test_quality_score_bounds(spark, docs):
    q = textstats.quality_score(docs).toPandas()
    assert ((q["quality"] > 0) & (q["quality"] <= 1)).all()
    assert (q["punct_ratio"] >= 0).all() and (q["punct_ratio"] <= 1).all()
    assert (q["n_tokens"] >= 0).all()


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD \n")],
        "id int, text string",
    )
    fps = [r["fingerprint"] for r in textstats.fingerprint(df).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_language_id_marks_cjk_and_english(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and that is that"),
            (2, "漢字のテストです、これは日本語"),
            (3, "qqq zzz xxx"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r["lang_pred"] for r in textstats.language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] in ("ja", "zh")
    assert got[3] == "und"


def test_embedding_cosine_dups_exact_verification(spark, emb):
    pairs = dedup.embedding_cosine_dups(
        emb.where(F.col("vec_id") < 100), "embedding", "vec_id", threshold=0.5,
        bucket_bits=4,
    ).toPandas()
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in emb.where(F.col("vec_id") < 100).collect()}
    for r in pairs.itertuples():
        a, b = rows[r.key_a], rows[r.key_b]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cosine - want) < 1e-9
        assert r.cosine >= 0.5


def test_ivf_indexed_matches_adhoc_and_prunes(spark, emb, tmp_path):
    """write_ivf + ivf_topk_indexed must return exactly what the ad-hoc
    cell-recompute path returns, and its scan must be partition-pruned to
    the probe cells (PartitionFilters in the plan, not a full read)."""
    import io
    from contextlib import redirect_stdout

    q = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    ivf_dir = str(tmp_path / "ivf")
    similarity.write_ivf(emb, "embedding", ivf_dir, bits=6)

    adhoc = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in similarity.ivf_topk(
            emb, "embedding", "vec_id", q, k=10, bits=6, probe_hamming=2
        ).collect()
    ]
    indexed_df = similarity.ivf_topk_indexed(
        spark, ivf_dir, "embedding", "vec_id", q, k=10, bits=6, probe_hamming=2
    )
    indexed = [(r["vec_id"], round(r["cosine"], 9)) for r in indexed_df.collect()]
    assert indexed == adhoc

    buf = io.StringIO()
    with redirect_stdout(buf):
        indexed_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan
    # the dynamic/static partition filter must actually carry the IN list
    assert "cell#" in plan or "cell IN" in plan.replace("`", "")


def test_ivf_indexed_recall(spark, emb, tmp_path):
    q = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    ivf_dir = str(tmp_path / "ivf_r")
    similarity.write_ivf(emb, "embedding", ivf_dir, bits=6)
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
    }
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk_indexed(
            spark, ivf_dir, "embedding", "vec_id", q, k=10, bits=6,
            probe_hamming=2,
        ).collect()
    }
    # same bar as the ad-hoc recall test: the synthetic embeddings are
    # near-uniform (no cluster structure), which caps hyperplane-LSH recall
    # at this scan fraction (22/64 cells) — a data property, not a code one
    assert len(exact & approx) >= 7


def test_minhash_hot_bucket_cluster_still_dedups(spark):
    """A boilerplate cluster LARGER than max_bucket skips the pair join
    (skew guard) but must still reduce via the exact-signature route
    (minhash_hot_bucket_losers) — being hot cannot exempt it from dedup."""
    boiler = "identical boilerplate banner text repeated everywhere verbatim"
    rows = [(i, boiler) for i in range(30)]  # one hot cluster
    rows += [(100 + i, f"unique document number {i} with its own words {i}")
             for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.minhash_dedup(
        df, "text", "doc_id", threshold=0.8, max_bucket=10
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # exactly one survivor (the smallest key) of the hot cluster; all
    # unique docs kept
    assert kept == [0] + [100 + i for i in range(8)]


def test_minhash_hot_bucket_losers_ignores_cold_buckets(spark):
    rows = [(i, f"plainly distinct content {i} {'x' * (i % 7)}")
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.minhash_signatures(df, "text", "doc_id", num_hashes=32)
    losers = dedup.minhash_hot_bucket_losers(
        sig, bands=8, rows_per_band=4, max_bucket=200
    )
    assert losers.count() == 0
