"""Agreement tests: the independent pure-Python mirror (oracle/pymirror.py)
vs Spark's JVM primitives and the engine's own implementations.

These are the trust anchor for the VALUES oracles: two separately written
implementations (mirror xxHash64 from the public spec vs Spark's; mirror
Porter 1980 vs analysis/filters.py's; mirror byte315 vs
functions/smallfloat.py's) must agree — a bug in either side surfaces as a
mismatch here or in scripts/verify_oracles.py.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.oracle import pymirror as pm

STRS = [
    "", "a", "ab", "abc", "abcd", "hello world", "x" * 7, "y" * 8, "z" * 9,
    "q" * 31, "r" * 32, "s" * 33, "t" * 63, "u" * 64, "v" * 100,
    "déjà vu", "日本語テスト", "the quick brown fox jumps over the lazy dog",
]


def test_xxh64_string_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRS], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [pm.spark_xxhash64(("str", s)) for s in STRS]


def test_xxh64_int_long_chain_matches_spark(spark):
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 123456789012345]
    df = spark.createDataFrame([(v,) for v in longs], "l long")
    assert [r[0] for r in df.select(F.xxhash64("l")).collect()] == [
        pm.spark_xxhash64(("long", v)) for v in longs
    ]
    # chained seeds: string + int literal (the minhash family shape)
    df2 = spark.createDataFrame([(s,) for s in STRS if s], "s string")
    for i in (0, 7, 63):
        got = [r[0] for r in df2.select(F.xxhash64("s", F.lit(i))).collect()]
        assert got == [
            pm.spark_xxhash64(("str", s), ("int", i)) for s in STRS if s
        ]
    # int,int (the hyperplane sign shape)
    row = spark.sql("SELECT xxhash64(3, 5), xxhash64(0, 0), xxhash64(63, 7)")
    assert list(row.collect()[0]) == [
        pm.spark_xxhash64(("int", 3), ("int", 5)),
        pm.spark_xxhash64(("int", 0), ("int", 0)),
        pm.spark_xxhash64(("int", 63), ("int", 7)),
    ]


def test_byte315_agrees_with_engine():
    from elasticsearch_spark.functions.smallfloat import effective_doc_length

    dls = np.arange(1, 5000)
    eng = effective_doc_length(dls, quantize=True)
    mir = np.array([pm.effective_doc_len_mirror(int(d)) for d in dls])
    assert np.allclose(eng, mir, rtol=1e-9)


def test_porter_mirror_agrees_with_engine():
    from elasticsearch_spark.analysis.filters import porter_stem

    words = [
        "caresses", "ponies", "ties", "agreed", "plastered", "motoring",
        "conflated", "troubled", "sized", "hopping", "tanned", "falling",
        "happy", "sky", "relational", "conditional", "valenci", "digitizer",
        "vietnamization", "predication", "operator", "feudalism",
        "decisiveness", "formaliti", "sensibiliti", "triplicate",
        "formative", "formalize", "electriciti", "electrical", "hopeful",
        "goodness", "revival", "allowance", "inference", "airliner",
        "adjustable", "defensible", "irritant", "replacement", "adjustment",
        "dependent", "adoption", "communism", "activate", "effective",
        "bowdlerize", "probate", "rate", "cease", "controll", "roll",
        "merges", "grouping", "tables", "queries",
    ]
    mism = [w for w in words if porter_stem(w) != pm.porter_stem_mirror(w)]
    assert mism == []


def test_simple_tokenizer_agrees_on_fixture():
    from elasticsearch_spark.analysis.analyzers import tokenize_text
    from elasticsearch_spark.config import AnalyzerConfig

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    cfg = AnalyzerConfig(kind="simple")
    for t in docs["text"].head(200):
        assert tokenize_text(t, cfg) == pm.simple_tokens(t)


def test_minhash_signature_matches_spark(spark):
    from elasticsearch_spark.pipeline import dedup

    docs = [(0, "key agg row scan slow"), (1, "fast table value part hash"),
            (2, "tiny"), (3, "a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = (
        dedup.minhash_signatures(df, "text", "doc_id", num_hashes=8)
        .orderBy("key")
        .collect()
    )
    for row in sig:
        mine = pm.minhash_signature(
            dict(docs)[row["key"]], num_hashes=8, shingle_size=5
        )
        assert list(row["minhash"]) == mine


def test_simhash_matches_spark(spark):
    from elasticsearch_spark.pipeline import dedup

    docs = [(0, "key agg row scan slow"), (1, "fast table value part hash"),
            (2, "key agg row scan slow")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = dedup.simhash_signatures(df, "text", "doc_id").orderBy("key").collect()
    for row in sig:
        assert row["simhash"] == pm.simhash64(dict(docs)[row["key"]])


def test_spark_round_half_up(spark):
    vals = [0.95825, 1.00004999, 2.5e-4, 0.12345, 0.99995, 127.532417]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(F.round("x", 4)).collect()]
    assert got == [pm.spark_round(v, 4) for v in vals]


def test_riff_parser_agrees_with_wave_module():
    from elasticsearch_spark.pipeline.multimodal import _wav_bytes, decode_wav

    for key in (1, 4, 7, 16):
        payload = _wav_bytes(key, 800 + (key % 5) * 400)
        eng_pcm, eng_rate = decode_wav(payload)
        mir_pcm, mir_rate = pm.parse_riff_pcm16(payload)
        assert eng_rate == mir_rate
        assert np.array_equal((eng_pcm * 32768.0).astype("<i2"), mir_pcm)


def test_bm25_mirror_matches_pyref():
    from elasticsearch_spark.oracle.pyref import PyRefEngine
    from elasticsearch_spark.config import AnalyzerConfig

    docs = pd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = [(int(r.doc_id), r.text) for r in docs.itertuples(index=False)]
    eng = PyRefEngine(analyzer=AnalyzerConfig(kind="simple"))
    for k, t in pairs:
        eng.index(k, t)
    ref = eng.match("table scan merge", k=10)
    mir = pm.bm25_topk_mirror(pairs, "table scan merge", k=10)
    assert [k for k, _ in ref] == [k for k, _ in mir]
    for (_, a), (_, b) in zip(ref, mir):
        assert math.isclose(a, b, rel_tol=1e-9)


def test_vectorized_int_family_equals_scalar_chain():
    """The numpy-vectorized xxh64_int family must equal the scalar
    F.xxhash64(str, lit(i)) chain bit-for-bit."""
    for s in ("hello", "abcde", "x" * 40, "日本語", ""):
        seed = pm.xxh64_bytes(s.encode("utf-8"), 42)
        fam = pm._xxh64_int_family(64, seed)
        assert list(fam) == [
            pm.spark_xxhash64(("str", s), ("int", i)) for i in range(64)
        ]
