"""Round-6 correctness fixes taken from ADVICE r5:

* update_docs on an INDEXED non-content field (path/lang) actually
  re-indexes the touched shards — the shard fingerprint now hashes
  every indexed field's value, not just content_sha256 (the old
  builder skipped the rebuild and reported success while serving the
  stale value);
* ``_parse_where`` respects quoted string literals containing 'and';
* ``facet_ranges_stored`` validates gap/bounds up front instead of
  producing bogus buckets via a numpy zero-division.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gxdindexer_spark.operators.index_build import IndexBuilder, update_docs
from gxdindexer_spark.operators.query import IndexQueryEngine, _parse_where
from gxdindexer_spark.sources.synth import generate_corpus
from gxdindexer_spark.sources.tables import prepare_docs


def _build_multifield(spark, tmp_path, name: str):
    idx = str(tmp_path / name)
    corpus = generate_corpus(spark, 60, seed=11, partitions=2)
    docs = prepare_docs(corpus, docs_per_shard=30, partitions=2).withColumn(
        "n_chars", F.length("content")
    )
    # default fields: content/path/lang all INDEXED
    builder = IndexBuilder(docs_per_shard=30, salt_range=64, block_size=16)
    builder.build(docs, idx, resume=False)
    return idx, builder


def test_update_indexed_noncontent_field_reindexes(spark, tmp_path):
    idx, builder = _build_multifield(spark, tmp_path, "langupd")
    m = update_docs(
        spark, idx, builder, {7: {"lang": "zzz"}}, assume_dense_shards=True
    )
    assert m["docs_updated"] == 1 and m["shards_rebuilt"] == 1
    # the builder must have ACTUALLY rebuilt the shard (the r5 bug:
    # fingerprint unchanged -> rebuild skipped, success reported)
    assert m.get("shards_built") == 1, m
    eng = IndexQueryEngine(spark, idx)
    # doc store serves the new value...
    got = {
        int(r["doc_id"]): r["lang"]
        for r in eng.get_docs([7], columns=("lang",)).collect()
    }
    assert got == {7: "zzz"}
    # ...and so do the POSTINGS: the new lang term is searchable
    hits = [
        int(r["doc_id"])
        for r in eng.topk("zzz", fields=["lang"]).collect()
    ]
    assert hits == [7]
    # replay of the identical update is a fingerprint no-op
    m2 = update_docs(
        spark, idx, builder, {7: {"lang": "zzz"}}, assume_dense_shards=True
    )
    assert m2.get("shards_built") == 0, m2


def test_parse_where_quoted_and():
    assert _parse_where("lang == 'rock and roll' and n_chars < 10") == [
        ("lang", "==", "rock and roll"),
        ("n_chars", "<", 10),
    ]
    assert _parse_where("lang == 'a and b and c'") == [
        ("lang", "==", "a and b and c")
    ]
    # plain clauses still split and malformed input still raises
    assert _parse_where("a >= 3 and b != 'x'") == [
        ("a", ">=", 3),
        ("b", "!=", "x"),
    ]
    with pytest.raises(ValueError):
        _parse_where("lang ~ 'x'")


def test_facet_range_validates_gap_and_bounds(spark, tmp_path):
    idx, _builder = _build_multifield(spark, tmp_path, "rangeval")
    eng = IndexQueryEngine(spark, idx)
    with pytest.raises(ValueError, match="gap"):
        eng.facet_ranges_stored("if", by="n_chars", start=0, end=100, gap=0)
    with pytest.raises(ValueError, match="start < end"):
        eng.facet_ranges_stored(
            "if", by="n_chars", start=100, end=100, gap=10
        )
