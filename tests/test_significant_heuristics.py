"""significant_terms heuristics vs hand-computed reference values.

Reference formulas: search/aggregations/bucket/significant/heuristics/
ChiSquare.java:70-80, MutualInformation.java:73-113, GND.java:75-96,
JLHScore.java:64-101, over NXYSignificanceHeuristic.computeNxys
(backgroundIsSuperset=true, includeNegatives=false — the parser defaults).
"""

import math

import pytest

from elasticsearch_spark.ops import aggs
from pyspark.sql import functions as F

# corpus: 10 docs, foreground = 4 docs (flag), term buckets by "cat"
#   cat=a: bg 5, fg 3   cat=b: bg 5, fg 1
ROWS = [
    ("a", True), ("a", True), ("a", True), ("a", False), ("a", False),
    ("b", True), ("b", False), ("b", False), ("b", False), ("b", False),
]
FG_TOTAL, BG_TOTAL = 4, 10


def nxy(fg, bg):
    n11 = float(fg)
    n_1 = float(FG_TOTAL)
    n1_ = float(bg)
    n = float(BG_TOTAL)
    n10 = n1_ - n11
    n_0 = n - n_1
    n0_ = n - n1_
    n01 = n_1 - n11
    n00 = n0_ - n01
    return n11, n_1, n1_, n, n10, n_0, n0_, n01, n00


def expected_chi2(fg, bg):
    n11, n_1, n1_, n, n10, n_0, n0_, n01, n00 = nxy(fg, bg)
    return n * (n11 * n00 - n01 * n10) ** 2 / (n_1 * n1_ * n0_ * n_0)


def expected_mi(fg, bg):
    n11, n_1, n1_, n, n10, n_0, n0_, n01, n00 = nxy(fg, bg)

    def term(nxy_, nx_, n_y):
        if nxy_ <= 0:
            return 0.0
        return (nxy_ / n) * math.log((n * nxy_) / (nx_ * n_y))

    return (
        term(n00, n0_, n_0) + term(n01, n0_, n_1)
        + term(n10, n1_, n_0) + term(n11, n1_, n_1)
    ) / math.log(2.0)


def expected_gnd(fg, bg):
    n11, n_1, n1_, n, *_ = nxy(fg, bg)
    fx, fy, fxy = n1_, n_1, n11
    if fxy == 0:
        return 0.0
    if fx == fy == fxy:
        return 1.0
    return math.exp(
        -(max(math.log(fx), math.log(fy)) - math.log(fxy))
        / (math.log(n) - min(math.log(fx), math.log(fy)))
    )


@pytest.fixture(scope="module")
def cat_df(spark):
    return spark.createDataFrame(ROWS, "cat string, flag boolean")


def run(df, heuristic, min_doc_count=1):
    out = aggs.significant_terms(
        df, "cat", F.col("flag"), size=10, heuristic=heuristic,
        min_doc_count=min_doc_count,
    )
    return {r["cat"]: r["sig_score"] for r in out.collect()}


def test_chi_square_hand_computed(cat_df):
    got = run(cat_df, "chi_square")
    # cat=a: over-represented (3/4 fg vs 2/6 rest) → kept
    assert got["a"] == pytest.approx(expected_chi2(3, 5), rel=1e-12)
    # cat=b: 1/4 < 4/6 → include_negatives=false scores it -Infinity
    # (ChiSquare.java:75-76 returns NEGATIVE_INFINITY, not a drop — the
    # bucket can still fill `size` when few positives exist)
    assert got["b"] == float("-inf")


def test_mutual_information_hand_computed(cat_df):
    got = run(cat_df, "mutual_information")
    assert got["a"] == pytest.approx(expected_mi(3, 5), rel=1e-12)
    assert got["b"] == float("-inf")  # negative direction → -Infinity


def test_gnd_hand_computed(cat_df):
    got = run(cat_df, "gnd")
    assert got["a"] == pytest.approx(expected_gnd(3, 5), rel=1e-12)
    assert got["b"] == pytest.approx(expected_gnd(1, 5), rel=1e-12)


def test_gnd_perfect_cooccurrence(spark):
    # every doc is fg and contains the term → fx = fy = fxy → score 1.0
    df = spark.createDataFrame(
        [("x", True)] * 3, "cat string, flag boolean"
    )
    got = run(df, "gnd")
    assert got["x"] == pytest.approx(1.0)


def test_jlh_positive_change_only(cat_df):
    got = run(cat_df, "jlh")
    fg_pct_a, bg_pct_a = 3 / 4, 5 / 10
    assert got["a"] == pytest.approx(
        (fg_pct_a - bg_pct_a) * (fg_pct_a / bg_pct_a), rel=1e-12
    )
    # fg% 0.25 < bg% 0.5 → JLHScore.java:86-88 returns 0 (kept, ranked last)
    assert got["b"] == 0.0


def test_chi_square_degenerate_table_is_nan(spark):
    """Single bucket covering the whole corpus: N0_ = 0 forces both the
    numerator and denominator to 0 — Java 0.0/0.0 = NaN (ChiSquare.java:78
    has no guard), where naive Spark division would yield NULL."""
    df = spark.createDataFrame(
        [("x", True), ("x", True), ("x", False), ("x", False)],
        "cat string, flag boolean",
    )
    got = run(df, "chi_square")
    assert math.isnan(got["x"])


def test_negative_buckets_fill_size_ordering(cat_df):
    """-Infinity buckets sort after every real score but are returned when
    size allows — the reference's BucketSignificancePriorityQueue keeps
    them rankable rather than absent."""
    out = aggs.significant_terms(
        cat_df, "cat", F.col("flag"), size=2, heuristic="chi_square",
        min_doc_count=1,
    ).collect()
    assert [r["cat"] for r in out] == ["a", "b"]
    assert out[0]["sig_score"] > out[1]["sig_score"] == float("-inf")
