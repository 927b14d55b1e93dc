"""Per-shard top-k scoring: vectorized exact TAAT and block-max WAND.

Both run inside the ``applyInPandas`` worker of operators/query.py —
one call per shard (SURVEY.md §3.4 scatter-gather). Posting segments
are self-contained: per-posting doc lengths (the Lucene-norms analog)
travel inside the blocks, so scoring needs no doc_stats side lookup
and the query path shuffles ONLY the query terms' postings.

* ``taat`` (term-at-a-time) decodes every posting of every query term
  and accumulates scores fully vectorized (np.unique + np.add.at).
  It is the *exact* reference path — no pruning — and the shape that
  keeps all hot loops in numpy.
* ``wand`` is document-at-a-time block-max WAND (Ding & Suel, WWW'11,
  public): term upper bounds drive pivot selection, block-max metadata
  rejects blocks that cannot beat the running threshold, and skip
  pointers (block_first/block_last) jump cursors without decoding.
  Exactness property-tested against ``taat`` (SURVEY.md §5.4).

Scores are float64 with Lucene formulas from functions/bm25.py;
tiebreak (score desc, doc_id asc) everywhere.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
import pandas as pd

from gxdindexer_spark.functions import bm25
from gxdindexer_spark.functions.codec import PostingList, posting_list_from_row


@dataclass
class QuerySpec:
    """Broadcast query plan: per-(field, term_id) idf already multiplied
    by the field weight; per-field avgdl; BM25 params; boolean clauses.

    ``must_groups``: one entry per '+token' — a set of (field, term_id)
    alternatives; a doc must match AT LEAST ONE member of EVERY group
    (Lucene BooleanQuery MUST over multi-field term expansion).
    ``must_not``: (field, term_id) pairs that exclude a doc outright.
    Boolean queries score exactly like pure should-queries over the
    scoring terms; excluded/unmatched docs are filtered afterward.
    """

    term_weights: dict[tuple[str, int], float]  # (field, term_id) -> w*idf
    avgdl: dict[str, float]
    k1: float = bm25.K1
    b: float = bm25.B
    must_groups: tuple = ()  # tuple[frozenset[(field, term_id)], ...]
    must_not: frozenset = frozenset()  # frozenset[(field, term_id)]

    @property
    def is_boolean(self) -> bool:
        return bool(self.must_groups) or bool(self.must_not)


def _plists(postings: pd.DataFrame, spec: QuerySpec):
    """postings rows -> [(field, term_id, weight, PostingList)] for
    terms present in the spec, skipping zero-weight entries."""
    out = []
    for r in postings.itertuples():
        w = spec.term_weights.get((r.field, int(r.term_id)), 0.0)
        if w <= 0.0:
            continue
        out.append(
            (
                r.field,
                r.term_id,
                w,
                posting_list_from_row(str(r.term_id), r._asdict()),
            )
        )
    return out


def _topk_from_scores(
    doc_ids: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    if doc_ids.size == 0:
        return doc_ids, scores
    if doc_ids.size > k:
        # keep every candidate >= k-th score so ties break on doc_id
        thresh = np.partition(scores, doc_ids.size - k)[doc_ids.size - k]
        keep = scores >= thresh
        doc_ids, scores = doc_ids[keep], scores[keep]
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def taat(
    postings: pd.DataFrame,
    spec: QuerySpec,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact vectorized term-at-a-time scoring (with boolean clause
    filtering); returns top-k arrays."""
    # decode every relevant posting row ONCE, keyed (field, term_id) —
    # must_not terms carry no weight but still need their doc sets
    decoded: dict[tuple[str, int], tuple] = {}
    needed = (
        set(spec.term_weights)
        | {m for g in spec.must_groups for m in g}
        | set(spec.must_not)
    )
    for r in postings.itertuples():
        key = (r.field, int(r.term_id))
        if key in needed:
            decoded[key] = posting_list_from_row(
                str(r.term_id), r._asdict()
            ).decode_all()
    all_docs, all_contrib = [], []
    for key, (docs, tfs, dls) in decoded.items():
        w = spec.term_weights.get(key, 0.0)
        if w <= 0.0:
            continue
        contrib = w * bm25.tf_norm(
            tfs.astype(np.float64),
            dls.astype(np.float64),
            spec.avgdl[key[0]],
            spec.k1,
            spec.b,
        )
        all_docs.append(docs)
        all_contrib.append(contrib)
    if not all_docs:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs = np.concatenate(all_docs)
    contrib = np.concatenate(all_contrib)
    uniq, inv = np.unique(docs, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, contrib)
    # boolean clause filters (Lucene BooleanQuery semantics)
    keep = np.ones(uniq.size, dtype=bool)
    for group in spec.must_groups:
        gdocs = [decoded[m][0] for m in group if m in decoded]
        matched = (
            np.isin(uniq, np.concatenate(gdocs))
            if gdocs
            else np.zeros(uniq.size, dtype=bool)
        )
        keep &= matched
    if spec.must_not:
        xdocs = [decoded[m][0] for m in spec.must_not if m in decoded]
        if xdocs:
            keep &= ~np.isin(uniq, np.concatenate(xdocs))
    uniq, scores = uniq[keep], scores[keep]
    return _topk_from_scores(uniq, scores, k)


def phrase_topk_shard(
    postings: pd.DataFrame,
    ordered_tids: list[int],
    field: str,
    idf_sum: float,
    avgdl: float,
    k: int,
    k1: float = bm25.K1,
    b: float = bm25.B,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact phrase (slop=0) scoring for one shard, Lucene PhraseQuery
    semantics: tf = phrase frequency (adjacent position chains), idf =
    sum of the constituent terms' idfs, weighted by the field weight
    (folded into ``idf_sum``). Requires a positional index."""
    by_tid: dict[int, tuple] = {}
    for r in postings.itertuples():
        if r.field != field:
            continue
        tid = int(r.term_id)
        if tid in set(ordered_tids) and tid not in by_tid:
            pl = posting_list_from_row(str(tid), r._asdict())
            docs, _tfs, dls = pl.decode_all()
            by_tid[tid] = (docs, dls, pl.decode_all_positions())
    if any(t not in by_tid for t in ordered_tids):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    # candidate docs: intersection across all phrase terms
    common = by_tid[ordered_tids[0]][0]
    for t in ordered_tids[1:]:
        common = np.intersect1d(common, by_tid[t][0], assume_unique=True)
    out_docs, out_scores = [], []
    d0, dl0, p0 = by_tid[ordered_tids[0]]
    for doc in common:
        # candidates anchored at the FIRST term's positions: keep x if
        # term_i occurs at x+i for every following phrase slot
        cand = p0[int(np.searchsorted(d0, doc))]
        for i, t in enumerate(ordered_tids[1:], start=1):
            docs_t, _dls_t, pos_t = by_tid[t]
            j = int(np.searchsorted(docs_t, doc))
            cand = cand[np.isin(cand + i, pos_t[j])]
            if cand.size == 0:
                break
        pf = int(cand.size)
        if pf:
            dl = float(dl0[int(np.searchsorted(d0, doc))])
            score = idf_sum * float(bm25.tf_norm(pf, dl, avgdl, k1, b))
            out_docs.append(int(doc))
            out_scores.append(score)
    return _topk_from_scores(
        np.asarray(out_docs, np.int64), np.asarray(out_scores, np.float64), k
    )


def match_docs(postings: pd.DataFrame, spec: QuerySpec) -> np.ndarray:
    """Distinct doc ids matching ANY scoring term (OR semantics), with
    boolean clauses applied — the facet/count primitive behind the
    reference's `Hoxd*` image-count query
    (GxdResultHasImageIndexer.java:25-32)."""
    ids, _scores = taat(postings, spec, k=1 << 62)
    return ids


class _Cursor:
    """Iterates one posting list doc-at-a-time with block skipping."""

    __slots__ = ("pl", "field", "ub", "blk", "pos", "docs", "tfs", "dls",
                 "done", "w")

    def __init__(self, field: str, w: float, pl: PostingList):
        self.pl = pl
        self.field = field
        self.w = w
        # term-level upper bound = w * max block tf-norm (idf folded in w)
        self.ub = float(w * pl.block_max_tfn.max())
        self.blk = 0
        self.done = pl.n_blocks == 0
        self.pos = 0
        self.docs: np.ndarray | None = None
        self.tfs: np.ndarray | None = None
        self.dls: np.ndarray | None = None
        if not self.done:
            self._load(0)

    def _load(self, b: int) -> None:
        self.blk = b
        self.docs, self.tfs, self.dls = self.pl.decode_block(b)
        self.pos = 0

    @property
    def doc(self) -> int:
        return int(self.docs[self.pos])

    @property
    def tf(self) -> int:
        return int(self.tfs[self.pos])

    @property
    def dl(self) -> int:
        return int(self.dls[self.pos])

    def block_ub(self) -> float:
        return float(self.w * self.pl.block_max_tfn[self.blk])

    def next_after(self, target: int) -> None:
        """Advance cursor to first doc >= target, skipping via the
        block_last skip pointers without decoding skipped blocks."""
        pl = self.pl
        b = self.blk
        if pl.block_last[b] < target:
            b = int(np.searchsorted(pl.block_last, target))
            if b >= pl.n_blocks:
                self.done = True
                return
            self._load(b)
        p = int(np.searchsorted(self.docs, target))
        if p >= self.docs.size:  # target between blocks
            if self.blk + 1 >= pl.n_blocks:
                self.done = True
                return
            self._load(self.blk + 1)
            p = 0
        self.pos = p


def wand(
    postings: pd.DataFrame,
    spec: QuerySpec,
    k: int,
    use_block_max: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND exact top-k; rank-identical to ``taat``."""
    lists = _plists(postings, spec)
    if not lists:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cursors = [_Cursor(f, w, pl) for f, _t, w, pl in lists if pl.n_blocks]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    theta = 0.0

    def full_score(active: list[_Cursor]) -> float:
        s = 0.0
        for c in active:
            tfn = float(
                bm25.tf_norm(c.tf, c.dl, spec.avgdl[c.field], spec.k1, spec.b)
            )
            s += c.w * tfn
        return s

    while True:
        live = [c for c in cursors if not c.done]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        # pivot: first index where cumulative UB can beat theta
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(live):
            acc += c.ub
            # >= not >: a doc scoring exactly theta can still enter the
            # heap on the doc_id tiebreak — pruning it breaks rank
            # identity on exact ties.
            if acc >= theta or len(heap) < k:
                pivot_i = i
                break
        if pivot_i < 0:
            break
        pivot_doc = live[pivot_i].doc
        if live[0].doc == pivot_doc:
            leading = [c for c in live if not c.done and c.doc == pivot_doc]
            # block-max refinement: sum of current block UBs must beat theta
            if use_block_max and len(heap) >= k:
                block_acc = sum(c.block_ub() for c in leading)
                if block_acc < theta:  # strict: preserve tie candidates
                    for c in leading:
                        c.next_after(pivot_doc + 1)
                    continue
            s = full_score(leading)
            if len(heap) < k:
                heapq.heappush(heap, (s, -pivot_doc))
            elif (s, -pivot_doc) > heap[0]:
                heapq.heapreplace(heap, (s, -pivot_doc))
            if len(heap) == k:
                theta = heap[0][0]
            for c in leading:
                c.next_after(pivot_doc + 1)
        else:
            # advance all cursors before the pivot to pivot_doc
            for c in live[:pivot_i]:
                c.next_after(pivot_doc)
    ranked = sorted(heap, key=lambda t: (-t[0], -t[1]))
    doc_ids = np.array([-d for _s, d in ranked], dtype=np.int64)
    scores = np.array([s for s, _d in ranked], dtype=np.float64)
    return doc_ids, scores
