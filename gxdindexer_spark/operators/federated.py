"""Federated retrieval over multiple independently-built indexes —
the Solr distributed-search / collection-alias contract with EXACT
global IDF (Solr's ExactStatsCache, as opposed to its default
per-shard-stats scoring): N time- or source-partitioned indexes
(daily crawls, per-tenant corpora) queried as ONE logical index, with
ranking bit-identical to what a single merged index would produce.

Why this matters at 100 TB: a web-scale corpus is never one index —
it's an index per ingest window, compacted on their own schedules.
Federation gives query-time unification without re-indexing:

1. **Stats merge (driver-side, tiny)**: global df(term) = sum of the
   members' dictionary df; global N = sum of doc counts; global
   avgdl = doc-count-weighted mean. Cost: one pruned dictionary
   lookup per member (driver dict cache or term-IN pushed scan) —
   no data-plane work.
2. **One spec, N scatter-gathers**: the merged stats build a single
   QuerySpec whose weights every member evaluates; each member runs
   its normal per-shard top-k (IndexQueryEngine._topk_from_spec) and
   contributes k rows; the federator merges N*k tiny rows. This is
   exactly Solr's distributed query (shards=... scatter, federator
   merge), with our shards one level below.
3. **Exactness over pruning**: members force exact TAAT — their
   stored block-max bounds were computed under their OWN avgdl, so
   they don't cover scores under merged stats (the engine's
   stats_native guard enforces this even if a caller passes "wand").
   A federation-aware build could stamp global bounds; not worth it
   while the per-member scatter-gather is already bounded.

Member indexes must share the BM25 parameters and field/analyzer map
(checked at construction) and have globally-unique doc_ids (true by
construction for partitioned ingest of one corpus; NOT checked — two
indexes of unrelated corpora can collide).

Reference parity: the reference runs one Solr per index class and the
front-end federates result pages by hand (SURVEY §2 S8); this makes
federation a first-class engine operation with exact global scoring.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gxdindexer_spark.functions import hashing
from gxdindexer_spark.operators.query import (
    IndexQueryEngine,
    _HITS_SCHEMA,
    _empty_df,
)


class FederatedQueryEngine:
    """Query a list of member indexes as one logical index.

    Reuses ``IndexQueryEngine.make_spec`` unchanged by providing the
    same surface it reads: merged ``n_docs``/``avgdl``/``weights``,
    summed ``_lookup_stats``, and union ``expand_*`` rewrites: a
    wildcard/fuzzy token expands against EVERY member dictionary and
    the union is scored. Below the MAX_EXPANSIONS cap this equals the
    expansion of a merged dictionary; past it, each member truncates
    by ITS df ranking before the union — the same per-shard
    MultiTermQuery rewrite Solr distributed search performs."""

    # delegated verbatim: parsing and weight construction are
    # member-independent once stats/expansions resolve through self
    parse_query = staticmethod(IndexQueryEngine.parse_query)
    make_spec = IndexQueryEngine.make_spec
    choose_mode = IndexQueryEngine.choose_mode

    @staticmethod
    def _tid(term: str) -> int:
        return hashing.term_id(term)

    def __init__(
        self,
        spark: SparkSession,
        index_dirs: list[str],
        preload_dictionary: int = 1_000_000,
    ):
        if not index_dirs:
            raise ValueError("need at least one member index")
        self.spark = spark
        self.engines = [
            IndexQueryEngine(spark, d, preload_dictionary)
            for d in index_dirs
        ]
        e0 = self.engines[0]
        for e in self.engines[1:]:
            if (e.manifest["k1"], e.manifest["b"]) != (
                e0.manifest["k1"],
                e0.manifest["b"],
            ):
                raise ValueError(
                    "member indexes disagree on BM25 k1/b: "
                    f"{e.index_dir} vs {e0.index_dir}"
                )
            if e.fields != e0.fields:
                raise ValueError(
                    "member indexes disagree on field/analyzer map: "
                    f"{e.fields} vs {e0.fields}"
                )
        self.manifest = {"k1": e0.manifest["k1"], "b": e0.manifest["b"]}
        self.fields = dict(e0.fields)
        self.weights = dict(e0.weights)
        # exact global stats: N = sum, avgdl = doc-count-weighted mean
        self.n_docs: dict[str, int] = {}
        self.avgdl: dict[str, float] = {}
        for f in self.fields:
            ns = [e.n_docs.get(f, 0) for e in self.engines]
            n = sum(ns)
            self.n_docs[f] = n
            self.avgdl[f] = (
                sum(
                    e.avgdl.get(f, 0.0) * ni
                    for e, ni in zip(self.engines, ns)
                )
                / n
                if n
                else 0.0
            )

    # ---------------------------------------------- make_spec surface

    def _lookup_stats(self, pairs) -> dict[tuple[str, str], int]:
        """Global df = sum of member dfs (ExactStatsCache)."""
        out: dict[tuple[str, str], int] = {}
        for e in self.engines:
            for p, df in e._lookup_stats(pairs).items():
                out[p] = out.get(p, 0) + df
        return out

    def _expand_union(self, attr, *args) -> list[str]:
        terms: set[str] = set()
        for e in self.engines:
            terms.update(getattr(e, attr)(*args))
        return sorted(terms)

    def expand_prefix(self, field, prefix):
        return self._expand_union("expand_prefix", field, prefix)

    def expand_suffix(self, field, suffix):
        return self._expand_union("expand_suffix", field, suffix)

    def expand_infix(self, field, prefix, suffix):
        return self._expand_union("expand_infix", field, prefix, suffix)

    def expand_fuzzy(self, field, term, max_edits):
        return self._expand_union("expand_fuzzy", field, term, max_edits)

    # ----------------------------------------------------------- query

    def topk(
        self,
        query: str,
        k: int = 10,
        fields: list[str] | None = None,
    ) -> DataFrame:
        """-> (doc_id, score) global top-k across all members, ranked
        under exact global stats — bit-identical to a single merged
        index (the pytest + driver-oracle invariant). Each member
        contributes its local top-k (exact TAAT, see module
        docstring); the merge sees len(members) * k tiny rows."""
        spec = self.make_spec(query, fields)
        if not spec.term_weights:
            return _empty_df(self.spark, _HITS_SCHEMA)
        parts = [e._topk_from_spec(spec, k, "taat") for e in self.engines]
        merged = reduce(DataFrame.unionByName, parts)
        return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def count_matches(self, query: str, fields=None) -> DataFrame:
        """Federated match count: sum of member counts (disjoint
        doc_id spaces by contract)."""
        parts = [e.count_matches(query, fields) for e in self.engines]
        merged = reduce(DataFrame.unionByName, parts)
        return merged.agg(F.sum("n_matches").alias("n_matches"))

    # Stats-free serving surfaces federate by plain merge: matching,
    # faceting, sorting, point reads and export never read df/avgdl,
    # so member-local execution is already globally correct and the
    # federator only combines tiny per-member results.

    def facet_counts_stored(self, query: str, by: str, fields=None):
        """Federated facet.field: member shard-local counts sum."""
        parts = [
            e.facet_counts_stored(query, by, fields) for e in self.engines
        ]
        merged = reduce(DataFrame.unionByName, parts)
        return merged.groupBy(by).agg(F.sum("n_docs").alias("n_docs"))

    def facet_ranges_stored(
        self, query: str, by: str, start: int, end: int, gap: int,
        fields=None,
    ):
        """Federated facet.range: member bucket counts sum."""
        parts = [
            e.facet_ranges_stored(query, by, start, end, gap, fields)
            for e in self.engines
        ]
        merged = reduce(DataFrame.unionByName, parts)
        return merged.groupBy("bucket_start").agg(
            F.sum("n_docs").alias("n_docs")
        )

    def facet_pivot_stored(self, query: str, by_a: str, by_b: str,
                           fields=None):
        """Federated facet.pivot: member pair counts sum."""
        parts = [
            e.facet_pivot_stored(query, by_a, by_b, fields)
            for e in self.engines
        ]
        merged = reduce(DataFrame.unionByName, parts)
        return merged.groupBy(by_a, by_b).agg(
            F.sum("n_docs").alias("n_docs")
        )

    def sorted_matches(
        self,
        query: str,
        by: str,
        k: int = 10,
        offset: int = 0,
        ascending: bool = True,
        fields=None,
        columns: tuple[str, ...] = (),
        where: str | None = None,
    ) -> DataFrame:
        """Federated sort-by-stored-field page: each member emits its
        local top-(offset+k) (the same bound its own shards use), the
        federator re-sorts members*(offset+k) tiny rows and applies
        the global offset/limit — the standard distributed deep-page
        merge, one more level up."""
        parts = [
            e.sorted_matches(
                query,
                by=by,
                k=offset + k,
                ascending=ascending,
                fields=fields,
                columns=columns,
                where=where,
            )
            for e in self.engines
        ]
        merged = reduce(DataFrame.unionByName, parts)
        order = F.asc(by) if ascending else F.desc(by)
        out = merged.orderBy(order, F.asc("doc_id"))
        if offset:
            out = out.offset(offset)
        return out.limit(k)

    def get_docs(self, doc_ids, columns: tuple[str, ...] = ()):
        """Federated real-time get: each member point-reads its own
        hits; ids live in exactly one member (disjoint contract)."""
        parts = [e.get_docs(doc_ids, columns) for e in self.engines]
        return reduce(DataFrame.unionByName, parts).orderBy("doc_id")

    def export_matches(
        self,
        query: str,
        by: str,
        columns: tuple[str, ...] = (),
        ascending: bool = True,
        fields=None,
        where: str | None = None,
    ) -> DataFrame:
        """Federated /export: member shard-local hydration, one
        global range sort over the union."""
        parts = [
            e.export_matches(
                query,
                by=by,
                columns=columns,
                ascending=ascending,
                fields=fields,
                where=where,
            )
            for e in self.engines
        ]
        merged = reduce(DataFrame.unionByName, parts)
        order = F.asc(by) if ascending else F.desc(by)
        return merged.orderBy(order, F.asc("doc_id"))
