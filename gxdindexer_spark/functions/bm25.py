"""Lucene-default BM25 math (k1=1.2, b=0.75), pure numpy.

The reference delegates all scoring to Solr/Lucene (the only ranking
math in the reference repo is the field-priority boost ladder in
shr/SolrUtils.java:13-28). These are the public Lucene BM25Similarity
formulas (Lucene >= 8, i.e. Solr 8.11 as pinned by the reference's
pom.xml:21):

    idf(N, df)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm     = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = sum over query terms of idf * tf_norm

Design decision (SURVEY.md §7 "hard parts"): we use *exact* doc
lengths, not Lucene's SmallFloat-quantized norm byte, and keep engine,
oracle SQL, and tests consistent on that choice. All arithmetic is
float64; ranking tiebreak is (score desc, doc_id asc).

Field boosts follow the reference's boost ladder
(shr/SolrUtils.java:13-28): weight = max_boost / 1.5^position with a
floor of 1 — applied as per-field score weights at composition time.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75

# Field priority ladder, reference analog of Solr qf/copyField boosts
# (highest priority first, like SolrUtils.boost's fieldList). With
# max_boost=2.25 the ladder lands on lang=2.25, path=1.5, content=1.0 —
# so a content-only query scores *exactly* unweighted Lucene BM25.
FIELD_PRIORITY = ["lang", "path", "content"]
DEFAULT_MAX_BOOST = 2.25


def boost(field_list: list[str], field: str, max_boost: float = 1000.0) -> float:
    """Reference boost function (shr/SolrUtils.java:13-28): score =
    max_boost / 1.5^position-in-priority-list, floor 1, absent -> 0."""
    if field not in field_list:
        return 0.0
    w = max_boost / (1.5 ** field_list.index(field))
    return max(w, 1.0)


def field_weights(max_boost: float = DEFAULT_MAX_BOOST) -> dict[str, float]:
    """Per-field BM25 composition weights w_f."""
    return {f: boost(FIELD_PRIORITY, f, max_boost) for f in FIELD_PRIORITY}


def idf(N: float, df) -> np.ndarray:
    """Lucene BM25 idf. Accepts scalar or array df."""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def score(tf, dl, N: float, df, avgdl: float, k1: float = K1, b: float = B):
    """Per-posting BM25 contribution idf(N,df) * tf_norm(tf,dl)."""
    return idf(N, df) * tf_norm(tf, dl, avgdl, k1, b)


def brute_force_topk(
    docs_tokens: dict[int, list[str]],
    query_terms: list[str],
    k: int,
    k1: float = K1,
    b: float = B,
    dls: dict[int, int] | None = None,
) -> list[tuple[int, float]]:
    """Oracle: exhaustive BM25 over an in-memory corpus (SURVEY.md §5.2
    'at small scale brute force IS the spec'). Pure python+numpy,
    independent of the Spark engine; used by golden rank-identity tests.

    ``dls`` overrides per-doc lengths — expanding tokenizers count
    ORIGINAL token positions as dl (Lucene discountOverlaps), which is
    fewer than ``len(tokens)`` when word-part expansions are present.
    """
    N = len(docs_tokens)
    if N == 0:
        return []
    if dls is None:
        dls = {d: len(t) for d, t in docs_tokens.items()}
    avgdl = sum(dls.values()) / N
    uniq = list(dict.fromkeys(query_terms))  # dedup, keep order
    dfs = {
        t: sum(1 for toks in docs_tokens.values() if t in toks) for t in uniq
    }
    scores: dict[int, float] = {}
    for d, toks in docs_tokens.items():
        s = 0.0
        for t in uniq:
            tf = toks.count(t)
            if tf:
                s += float(
                    idf(N, dfs[t]) * tf_norm(tf, dls[d], avgdl, k1, b)
                )
        if s > 0:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
