"""Code-aware text analysis (tokenizers), pandas-vectorized.

The reference ships raw strings to Solr and lets the Solr schema's
analyzers tokenize (SURVEY.md §2.9); its Java-side emulation of
copyField — concatenating symbol + name + synonyms into one searchable
field (GxdResultIndexer.java:1046-1049,1114-1118) — is the model for
our *fielded document*: ``content``, ``path``, ``lang`` are analyzed
into separate per-field postings and combined at score time with the
boost ladder (functions/bm25.py).

All entry points take/return pandas objects and use ``pd.Series.str``
batch ops — they are meant to run inside Arrow-batched ``mapInPandas``
/ ``pandas_udf`` workers, never as per-row Python UDFs
(BASELINE.json input_hint).

Tokenizer contract (kept in lock-step with the pure-python oracle in
tests and the DuckDB oracle SQL):

* ``simple``  : lowercase, split on non-alphanumerics, drop empties.
* ``code``    : ``simple`` plus word-delimiter behavior — every raw
  ``[A-Za-z0-9_]+`` token emits its lowercased self, and, when it
  splits on camelCase / snake_case / digit boundaries into more than
  one part, also each lowercased part (Lucene
  WordDelimiterGraphFilter's preserveOriginal+generateWordParts,
  public contract).
* ``path``    : like ``code`` but also splits on ``/ . -``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

RAW_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")
# camelCase / ALLCAPS / digit-run sub-token splitter
SUB_TOKEN_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")
PATH_SEP_RE = re.compile(r"[/.\-_]+")


def simple_tokens(text: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]]: lowercase alnum tokens."""
    return text.fillna("").str.lower().str.findall(SIMPLE_TOKEN_RE)


def _split_parts(tokens: pd.Series) -> pd.Series:
    """Series[str raw token] -> Series[list[str] lowercased parts]."""
    parts = tokens.str.findall(SUB_TOKEN_RE)
    return parts.map(lambda ps: [p.lower() for p in ps])


def code_tokens(text: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] code-aware tokens.

    Emits lowercased originals in document order, then appends the
    sub-token expansions of any token that split into >1 part.
    """
    raw = text.fillna("").str.findall(RAW_TOKEN_RE)

    def one(toks: list[str]) -> list[str]:
        out = [t.lower() for t in toks]
        for t in toks:
            ps = SUB_TOKEN_RE.findall(t)
            if len(ps) > 1:
                out.extend(p.lower() for p in ps)
        return out

    return raw.map(one)


def path_tokens(text: pd.Series) -> pd.Series:
    """Path field: split on separators, then code-aware expansion."""
    return code_tokens(text.fillna("").str.replace(PATH_SEP_RE, " ", regex=True))


def lang_tokens(text: pd.Series) -> pd.Series:
    return text.fillna("").str.lower().str.strip().map(lambda s: [s] if s else [])


TOKENIZERS = {
    "simple": simple_tokens,
    "code": code_tokens,
    "path": path_tokens,
    "lang": lang_tokens,
}


def original_token_counts(text: pd.Series, tokenizer: str) -> pd.Series:
    """Series[str] -> Series[int]: number of ORIGINAL token positions.

    This is the BM25 ``dl`` for every build mode: word-part expansions
    share their original's position (Lucene discountOverlaps) and must
    not lengthen the doc, so positional and non-positional indexes of
    the same corpus rank identically.
    """
    if tokenizer == "simple":
        return simple_tokens(text).map(len).astype(np.int64)
    if tokenizer == "lang":
        return lang_tokens(text).map(len).astype(np.int64)
    src = text.fillna("")
    if tokenizer == "path":
        src = src.str.replace(PATH_SEP_RE, " ", regex=True)
    return src.str.count(RAW_TOKEN_RE).astype(np.int64)


def _synonym_pairs(synonyms: dict[str, list[str]]) -> pd.DataFrame:
    """{base -> [synonyms]} -> DataFrame(term, _syn) for a vectorized
    merge against exploded token rows. Bases are matched against
    ANALYZED tokens (post-lowercase, including sub-token expansions),
    so callers supply lowercase bases."""
    return pd.DataFrame(
        [(b, s) for b, ss in synonyms.items() for s in ss],
        columns=["term", "_syn"],
    )


def term_freqs(
    doc_ids: pd.Series,
    texts: pd.Series,
    tokenizer: str = "code",
    synonyms: dict[str, list[str]] | None = None,
) -> pd.DataFrame:
    """Batch (doc_id, text) -> DataFrame(doc_id, term, tf, dl).

    ``dl`` (doc length in tokens) is replicated per term row so the
    posting build can compute tf-norms without a second join. ``dl``
    counts ORIGINAL token positions (see ``original_token_counts``) so
    expanding tokenizers score identically with and without positions.
    ``synonyms`` applies index-time synonym expansion (Lucene
    SynonymGraphFilter at position-increment 0, the reference's
    pattern of indexing marker/structure synonyms into searchable
    fields — GxdResultIndexer.java:388-416,825-839): every occurrence
    of a base token ALSO emits each synonym, sharing the original's
    position, so dl/avgdl are untouched (discountOverlaps) while the
    synonym terms gain postings and df.
    Vectorized end-to-end like ``term_freqs_positions`` (same flat
    tokenize + factorize + lexsort + boundary-count aggregation, just
    without the positions payload) — the former pandas
    explode+groupby was the slower half of the non-positional
    tokenize stage.
    """
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype=np.int64),
            "dl": pd.Series([], dtype=np.int64),
        }
    )
    doc_idx, terms, _pos, dl_per_doc = _flat_positions(texts, tokenizer)
    if synonyms and len(terms):
        flat = pd.DataFrame({"di": doc_idx, "term": terms})
        extra = flat.merge(_synonym_pairs(synonyms), on="term", how="inner")
        if len(extra):
            doc_idx = np.concatenate(
                [doc_idx, extra["di"].to_numpy(np.int64)]
            )
            terms = np.concatenate([terms, extra["_syn"].to_numpy()])
    if not len(terms):
        return empty
    codes, uniq = pd.factorize(terms)
    order = np.lexsort((codes, doc_idx))
    d, c = doc_idx[order], codes[order]
    group_start = np.flatnonzero(
        np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
    )
    tf = np.diff(np.r_[group_start, len(d)])
    ids_np = doc_ids.to_numpy()
    return pd.DataFrame(
        {
            "doc_id": ids_np[d[group_start]],
            "term": uniq[c[group_start]],
            "tf": tf.astype(np.int64),
            "dl": dl_per_doc[d[group_start]],
        }
    )


def _with_positions_one(toks: list[str], expand: bool) -> list[tuple[str, int]]:
    """Token positions, Lucene WordDelimiter-style: originals at their
    document index; sub-token expansions share the original's position."""
    out = [(t.lower(), i) for i, t in enumerate(toks)]
    if expand:
        for i, t in enumerate(toks):
            ps = SUB_TOKEN_RE.findall(t)
            if len(ps) > 1:
                out.extend((p.lower(), i) for p in ps)
    return out


def tokens_with_positions(
    text: pd.Series, tokenizer: str = "code"
) -> pd.Series:
    """Series[str] -> Series[list[(token, position)]]."""
    if tokenizer == "simple":
        return text.fillna("").str.lower().str.findall(SIMPLE_TOKEN_RE).map(
            lambda ts: list(zip(ts, range(len(ts))))
        )
    if tokenizer == "lang":
        return lang_tokens(text).map(
            lambda ts: [(t, 0) for t in ts]
        )
    src = text.fillna("")
    if tokenizer == "path":
        src = src.str.replace(PATH_SEP_RE, " ", regex=True)
    return src.str.findall(RAW_TOKEN_RE).map(
        lambda ts: _with_positions_one(ts, expand=True)
    )


def _flat_positions(
    texts: pd.Series, tokenizer: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch tokenize-with-positions as FLAT arrays ->
    (doc_idx, terms, pos, dl_per_doc): one row per emitted token
    (``doc_idx`` indexes into the batch), plus per-doc original-stream
    length. Emission order per doc matches ``_with_positions_one``
    (originals in document order, then sub-token expansions) — only
    the container changed, from per-row tuple lists to flat numpy, so
    the grouped aggregation below can be fully vectorized."""
    if tokenizer == "simple":
        toks = text_lists = texts.fillna("").str.lower().str.findall(
            SIMPLE_TOKEN_RE
        )
        counts = toks.str.len().to_numpy(np.int64)
        terms = np.array(
            [t for ts in text_lists for t in ts], dtype=object
        )
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.arange(len(terms), dtype=np.int64) - starts
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        return doc_idx, terms, pos, counts
    if tokenizer == "lang":
        toks = lang_tokens(texts)
        counts = toks.str.len().to_numpy(np.int64)
        terms = np.array(
            [t for ts in toks for t in ts], dtype=object
        )
        pos = np.zeros(len(terms), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        return doc_idx, terms, pos, counts
    src = texts.fillna("")
    if tokenizer == "path":
        src = src.str.replace(PATH_SEP_RE, " ", regex=True)
    raw = src.str.findall(RAW_TOKEN_RE)
    dl = raw.str.len().to_numpy(np.int64)
    terms_l: list[str] = []
    pos_l: list[int] = []
    nper = np.empty(len(raw), dtype=np.int64)
    for ri, toks_row in enumerate(raw):
        k0 = len(terms_l)
        for i, t in enumerate(toks_row):
            terms_l.append(t.lower())
            pos_l.append(i)
        for i, t in enumerate(toks_row):
            ps = SUB_TOKEN_RE.findall(t)
            if len(ps) > 1:
                for p in ps:
                    terms_l.append(p.lower())
                    pos_l.append(i)
        nper[ri] = len(terms_l) - k0
    doc_idx = np.repeat(np.arange(len(raw), dtype=np.int64), nper)
    return (
        doc_idx,
        np.array(terms_l, dtype=object),
        np.array(pos_l, dtype=np.int64),
        dl,
    )


def term_freqs_positions(
    doc_ids: pd.Series,
    texts: pd.Series,
    tokenizer: str = "code",
    synonyms: dict[str, list[str]] | None = None,
) -> pd.DataFrame:
    """Like ``term_freqs`` but adds a ``positions`` column: the sorted
    token positions of each (doc, term) — the phrase-query payload.
    ``synonyms`` expand at the base token's POSITION (see
    ``term_freqs``), so phrases match through either the original or
    the synonym.

    Aggregation is vectorized end-to-end (factorize + lexsort + group
    boundary split): the former per-group ``sorted`` lambda was ~75%
    of the positional tokenize stage's wall time (2.5 s of 3.4 s per
    10k-doc batch — optimization guide §4.2: hand whole batches to
    native kernels, no per-row/per-group Python)."""
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype=np.int64),
            "dl": pd.Series([], dtype=np.int64),
            "positions": pd.Series([], dtype=object),
        }
    )
    doc_idx, terms, pos, dl_per_doc = _flat_positions(texts, tokenizer)
    if synonyms and len(terms):
        flat = pd.DataFrame({"di": doc_idx, "term": terms, "pos": pos})
        extra = flat.merge(_synonym_pairs(synonyms), on="term", how="inner")
        if len(extra):
            doc_idx = np.concatenate(
                [doc_idx, extra["di"].to_numpy(np.int64)]
            )
            terms = np.concatenate(
                [terms, extra["_syn"].to_numpy()]
            )
            pos = np.concatenate([pos, extra["pos"].to_numpy(np.int64)])
    if not len(terms):
        return empty
    codes, uniq = pd.factorize(terms)
    order = np.lexsort((pos, codes, doc_idx))
    d, c, p = doc_idx[order], codes[order], pos[order]
    group_start = np.flatnonzero(
        np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
    )
    tf = np.diff(np.r_[group_start, len(d)])
    ids_np = doc_ids.to_numpy()
    return pd.DataFrame(
        {
            "doc_id": ids_np[d[group_start]],
            "term": uniq[c[group_start]],
            "tf": tf.astype(np.int64),
            "dl": dl_per_doc[d[group_start]],
            "positions": np.split(p, group_start[1:]),
        }
    )


def token_char_spans(text: str, tokenizer: str) -> list[tuple[int, int]]:
    """Character spans (start, end) of the ORIGINAL token positions in
    ``text`` — span i corresponds to position i of the positional
    index, so a highlight window [start_pos, end_pos] renders as
    ``text[spans[start_pos][0]:spans[end_pos][1]]``.

    'simple' tokenizes the LOWERCASED text; ASCII lowering is
    length-stable so the lowered offsets index the original string
    (code corpora are ASCII-dominated; a locale-expanding lowercase
    would shift offsets). 'code' emits word-part expansions that SHARE
    their original's position (Lucene discountOverlaps), so spans are
    the raw tokens'. 'path'/'lang' REWRITE the text before tokenizing
    (separator collapse / whole-value token) — offsets don't map back,
    so snippet rendering refuses rather than mis-slice."""
    if tokenizer == "simple":
        return [m.span() for m in SIMPLE_TOKEN_RE.finditer(text.lower())]
    if tokenizer == "code":
        return [m.span() for m in RAW_TOKEN_RE.finditer(text)]
    raise ValueError(
        f"tokenizer {tokenizer!r} rewrites text before tokenizing — "
        "char offsets cannot map back to the stored field"
    )


def phrase_tokens(query: str, tokenizer: str = "code") -> list[str]:
    """Query-side phrase analysis: the ORIGINAL token sequence in
    document order (no word-part expansions, no dedup) — position i of
    the result must match indexed position offsets."""
    pairs = tokens_with_positions(pd.Series([query]), tokenizer).iloc[0]
    by_pos: dict[int, str] = {}
    for tok, pos in pairs:  # first token seen at a position = original
        by_pos.setdefault(pos, tok)
    return [by_pos[p] for p in sorted(by_pos)]


def tokenize_query(query: str, tokenizer: str = "code") -> list[str]:
    """Query-side analysis — must match the index-side analyzer
    (SURVEY.md §3.4). Dedups while preserving order."""
    toks = TOKENIZERS[tokenizer](pd.Series([query])).iloc[0]
    return list(dict.fromkeys(toks))
