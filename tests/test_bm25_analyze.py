"""Unit tests: Lucene BM25 formulas vs hand calculation; tokenizer
splits; boost ladder (SURVEY.md §5.1)."""

import math

import pandas as pd
import pytest

from gxdindexer_spark.functions import analyze, bm25


def test_idf_matches_hand_calc():
    # N=10 docs, df=2: ln(1 + (10-2+0.5)/(2+0.5)) = ln(4.4)
    assert bm25.idf(10, 2) == pytest.approx(math.log(4.4))


def test_tf_norm_matches_hand_calc():
    # tf=3, dl=100, avgdl=80: 3/(3+1.2*(0.25+0.75*100/80))
    expected = 3 / (3 + 1.2 * (1 - 0.75 + 0.75 * 100 / 80))
    assert bm25.tf_norm(3, 100, 80.0) == pytest.approx(expected)


def test_score_composition():
    s = bm25.score(tf=2, dl=50, N=100, df=5, avgdl=60.0)
    expected = math.log(1 + (100 - 5 + 0.5) / 5.5) * (
        2 / (2 + 1.2 * (0.25 + 0.75 * 50 / 60))
    )
    assert s == pytest.approx(expected)


def test_boost_ladder_matches_reference():
    """shr/SolrUtils.java:13-28: maxBoost/1.5^pos, floor 1, absent 0."""
    fields = ["a", "b", "c"]
    assert bm25.boost(fields, "a", 1000) == pytest.approx(1000.0)
    assert bm25.boost(fields, "b", 1000) == pytest.approx(1000 / 1.5)
    assert bm25.boost(fields, "c", 1000) == pytest.approx(1000 / 2.25)
    assert bm25.boost(fields, "zz", 1000) == 0.0
    assert bm25.boost(["x", "y"], "y", 1.0) == 1.0  # floor


def test_brute_force_topk_tiebreak():
    docs = {1: ["a", "b"], 2: ["a", "b"], 3: ["c"]}
    top = bm25.brute_force_topk(docs, ["a"], k=3)
    # identical scores -> doc_id asc tiebreak
    assert [d for d, _ in top] == [1, 2]


# ------------------------------------------------------------ tokenizer


def _code(s):
    return analyze.code_tokens(pd.Series([s])).iloc[0]


def test_code_tokenizer_camel_snake():
    assert _code("getFooBar") == ["getfoobar", "get", "foo", "bar"]
    assert _code("snake_case_id") == ["snake_case_id", "snake", "case", "id"]
    assert _code("HTTPServer2") == ["httpserver2", "http", "server2"]
    assert _code("plain") == ["plain"]


def test_simple_tokenizer():
    toks = analyze.simple_tokens(pd.Series(["Hello, World 42!"])).iloc[0]
    assert toks == ["hello", "world", "42"]


def test_path_tokenizer():
    toks = analyze.path_tokens(pd.Series(["src/main/FooBar.java"])).iloc[0]
    assert "foobar" in toks and "foo" in toks and "java" in toks and "src" in toks


def test_term_freqs_counts_and_dl():
    tf = analyze.term_freqs(
        pd.Series([7]), pd.Series(["a b a c"]), tokenizer="simple"
    )
    d = {r.term: (r.tf, r.dl) for r in tf.itertuples()}
    assert d == {"a": (2, 4), "b": (1, 4), "c": (1, 4)}
    assert set(tf.doc_id) == {7}


def test_term_freqs_empty_batch():
    tf = analyze.term_freqs(pd.Series([], dtype="int64"), pd.Series([], dtype=object))
    assert list(tf.columns) == ["doc_id", "term", "tf", "dl"]
    assert len(tf) == 0


def test_tokenize_query_dedup_order():
    assert analyze.tokenize_query("fooBar foo bar fooBar") == [
        "foobar",
        "foo",
        "bar",
    ]
