"""Deterministic synthetic source-code corpus generator.

Produces the input_hint table shape ``(repo, path, commit, lang,
content)`` distributed via ``mapInPandas`` over ``spark.range`` — no
driver-side materialization, so it scales to any row count. All
randomness is a counter-based integer mix of (seed, doc_id, position):
the corpus is byte-identical regardless of partitioning or parallelism
(needed for the two-parallelism scaling runs, which must see identical
input).

The vocabulary is Zipf-skewed on purpose: stopword-like code terms
(``if``, ``return``, ``import``...) get posting lists orders of
magnitude longer than the median, exercising the salted skew path
(SURVEY.md §4.1, north_rule "skew handled explicitly").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gxdindexer_spark import schemas

# most-common-first vocabulary: keywords, then identifiers (camel/snake).
KEYWORDS = (
    "if return import def the self for in not none is else from class "
    "try except raise while with as pass break continue lambda and or"
).split()
IDENTS = [
    f"{v}{n.capitalize()}{s.capitalize()}"
    for v in ("get", "set", "parse", "build", "read", "write", "merge", "scan")
    for n in ("index", "token", "posting", "block", "shard", "query", "doc", "term")
    for s in ("list", "map", "buffer", "stats", "cache", "batch", "meta", "codec")
]
SNAKES = [
    f"{a}_{b}"
    for a in ("max", "min", "total", "byte", "salt", "skew", "rank", "hash")
    for b in ("count", "offset", "length", "weight", "bound", "limit", "width", "seed")
]
VOCAB = np.array(KEYWORDS + IDENTS + SNAKES, dtype=object)
LANGS = np.array(["py", "java", "go", "rs", "cpp", "js"], dtype=object)

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based deterministic hash."""
    with np.errstate(over="ignore"):
        z = (x + _MIX1).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _MIX2
        z = (z ^ (z >> np.uint64(27))) * _MIX3
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (_mix(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _gen_batch(doc_ids: np.ndarray, seed: int) -> pd.DataFrame:
    n = doc_ids.size
    base = _mix(doc_ids.astype(np.uint64) + np.uint64(seed * 1_000_003))
    dls = (40 + (_mix(base + np.uint64(1)) % np.uint64(360))).astype(np.int64)
    max_dl = int(dls.max()) if n else 0
    # (n, max_dl) word index matrix: Zipf-ish via u^3 onto common-first vocab
    pos = np.arange(max_dl, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        cell = base[:, None] * np.uint64(0x5851F42D4C957F2D) + pos
    u = _u01(cell.reshape(-1)).reshape(n, max_dl)
    widx = np.minimum((len(VOCAB) * u**3).astype(np.int64), len(VOCAB) - 1)
    words = VOCAB[widx]
    mask = np.arange(max_dl)[None, :] < dls[:, None]
    contents = [" ".join(words[i, : dls[i]]) for i in range(n)]
    del mask
    repo_n = (_mix(base + np.uint64(2)) % np.uint64(50)).astype(np.int64)
    mod_n = (_mix(base + np.uint64(3)) % np.uint64(20)).astype(np.int64)
    lang = LANGS[(_mix(base + np.uint64(4)) % np.uint64(len(LANGS))).astype(np.int64)]
    commits = [format(int(c), "040x") for c in (_mix(base + np.uint64(5)))]
    return pd.DataFrame(
        {
            "repo": [f"org/repo{r:03d}" for r in repo_n],
            "path": [
                f"src/module{m:02d}/file_{int(d):07d}.{lg}"
                for m, d, lg in zip(mod_n, doc_ids, lang)
            ],
            "commit": commits,
            "lang": lang,
            "content": contents,
        }
    )


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` files."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=schemas.CORPUS)
    )
