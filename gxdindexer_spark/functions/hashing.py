"""Term identifiers.

Posting shuffles carry a fixed-width 60-bit ``term_id`` instead of the
term string: the two Arrow boundaries of the SPIMI build (encode,
merge) then move only numeric columns — no per-row Python string
materialization — and parquet predicate pushdown at query time filters
on an integer column. The (field, term) -> term_id mapping lives in the
dictionary table.

term_id = int(md5(term)[:15 hex], 16)  (60 bits, deterministic,
reproducible from any language). Collisions within a field merge two
terms' postings, so the dictionary finalize step DETECTS them
(count distinct terms per term_id) and raises; at 60 bits the
probability of any collision stays < 1e-3 up to ~5e7 unique terms per
field — beyond that, widen to the md5 128 bits (two longs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def term_id(term: str) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16)


def term_ids(terms: pd.Series) -> np.ndarray:
    """Vectorized-ish mapping: hash each UNIQUE term once per batch."""
    uniq, inv = np.unique(terms.to_numpy(dtype=object), return_inverse=True)
    ids = np.fromiter(
        (term_id(t) for t in uniq), dtype=np.int64, count=len(uniq)
    )
    return ids[inv]
