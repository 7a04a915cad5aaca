"""Analyzer golden-token tests — mirrors the reference's _analyze API tests
(/root/reference/src/test/java/org/elasticsearch/indices/analyze/
AnalyzeActionTests.java:38-50): exact token sequences for the standard chain.
"""

import pandas as pd
import pytest

from elasticsearch_spark.analysis import analyze_series, tokenize_text
from elasticsearch_spark.config import AnalyzerConfig

GOLDEN = [
    ("this is a test", ["this", "is", "a", "test"]),
    ("THIS IS A TEST", ["this", "is", "a", "test"]),  # lowercase filter
    ("Don't stop", ["don't", "stop"]),  # MidNumLetQ apostrophe
    ("O'Neil's l'avion", ["o'neil's", "l'avion"]),
    ("C++ rocks", ["c", "rocks"]),  # symbols split
    ("a_b-c", ["a_b", "c"]),  # ExtendNumLet joins '_', hyphen splits
    ("pi is 3.14", ["pi", "is", "3.14"]),  # MidNumLet '.' in numbers
    ("1,000 units", ["1,000", "units"]),  # MidNum ',' digits only
    ("a,b", ["a", "b"]),  # ',' does not join letters
    ("a.b.c", ["a.b.c"]),  # '.' joins word chars
    ("user@example.com", ["user", "example.com"]),  # '@' splits
    ("http://foo.bar/baz", ["http", "foo.bar", "baz"]),
    ("Ångström café", ["ångström", "café"]),  # unicode letters + lowercase
    ("漢字テスト", ["漢", "字", "テスト"]),  # CJK per-char, katakana run
    ("ＦＵＬＬ１２３", ["ｆｕｌｌ１２３"]),  # full-width forms are word chars
    ("", []),
    ("   \t\n ", []),  # zero terms
    ("...!!!", []),  # punctuation only
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_standard_analyzer_golden(text, expected):
    assert tokenize_text(text) == expected


def test_max_token_length_splits():
    toks = tokenize_text("x" * 600)
    assert [len(t) for t in toks] == [255, 255, 90]


def test_series_matches_scalar():
    texts = [t for t, _ in GOLDEN] + [None]
    got = analyze_series(pd.Series(texts)).tolist()
    assert got[:-1] == [e for _, e in GOLDEN]
    assert got[-1] == []


def test_simple_analyzer_sql_equivalence():
    cfg = AnalyzerConfig(kind="simple")
    assert tokenize_text("Don't stop 3.14 C++", cfg) == ["don", "t", "stop", "3", "14", "c"]


def test_whitespace_and_keyword():
    assert tokenize_text("Foo  Bar", AnalyzerConfig(kind="whitespace", lowercase=False)) == ["Foo", "Bar"]
    assert tokenize_text("Foo Bar", AnalyzerConfig(kind="keyword")) == ["Foo Bar"]


def test_stopwords_filter():
    cfg = AnalyzerConfig(stopwords=("the", "a"))
    assert tokenize_text("the quick a fox", cfg) == ["quick", "fox"]
