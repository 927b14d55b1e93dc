"""Property test: vectorized block-max MaxScore (wand) is
rank-identical to exact TAAT on arbitrary posting lists — the
SURVEY.md §5.4 exactness property, independent of Spark."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gxdindexer_spark.functions import bm25
from gxdindexer_spark.functions.codec import encode_postings
from gxdindexer_spark.operators import wand as W

AVGDL = 20.0


@st.composite
def postings_frame(draw):
    n_terms = draw(st.integers(1, 5))
    block_size = draw(st.sampled_from([4, 8, 16]))
    rows = []
    weights = {}
    for t in range(n_terms):
        n = draw(st.integers(1, 60))
        docs = np.array(
            sorted(
                draw(
                    st.sets(st.integers(0, 300), min_size=n, max_size=n)
                )
            ),
            dtype=np.int64,
        )
        n = docs.size
        tfs = np.array(
            draw(st.lists(st.integers(1, 9), min_size=n, max_size=n)),
            dtype=np.uint64,
        )
        dls = np.array(
            draw(st.lists(st.integers(1, 50), min_size=n, max_size=n)),
            dtype=np.uint64,
        )
        tfn = bm25.tf_norm(tfs.astype(float), dls.astype(float), AVGDL)
        row = encode_postings(docs, tfs, tfn, block_size, dls=dls)
        row.update(shard=0, field="content", term_id=t)
        rows.append(row)
        weights[("content", t)] = draw(
            st.floats(0.05, 5.0, allow_nan=False, allow_infinity=False)
        )
    pdf = pd.DataFrame(rows)
    spec = W.QuerySpec(term_weights=weights, avgdl={"content": AVGDL})
    return pdf, spec


@given(postings_frame(), st.integers(1, 15), st.booleans())
@settings(max_examples=120, deadline=None)
def test_wand_rank_identical_to_taat(pf, k, use_block_max):
    pdf, spec = pf
    dw, sw = W.wand(pdf, spec, k, use_block_max=use_block_max)
    dt, st_ = W.taat(pdf, spec, k)
    assert np.array_equal(dw, dt)
    np.testing.assert_allclose(sw, st_, rtol=1e-12)


def test_wand_skewed_lists_prune_nonessential():
    """A rare high-weight term + a very long stopword list: the long
    list must land non-essential and the result stays exact."""
    rng = np.random.RandomState(0)
    long_docs = np.arange(0, 5000, dtype=np.int64)
    long_tfs = rng.randint(1, 4, long_docs.size).astype(np.uint64)
    long_dls = rng.randint(10, 40, long_docs.size).astype(np.uint64)
    rare_docs = np.array(sorted(rng.choice(5000, 40, replace=False)), dtype=np.int64)
    rare_tfs = rng.randint(1, 6, rare_docs.size).astype(np.uint64)
    rare_dls = rng.randint(10, 40, rare_docs.size).astype(np.uint64)
    rows = []
    for tid, (d, tf, dl) in enumerate(
        [(long_docs, long_tfs, long_dls), (rare_docs, rare_tfs, rare_dls)]
    ):
        tfn = bm25.tf_norm(tf.astype(float), dl.astype(float), AVGDL)
        row = encode_postings(d, tf, tfn, 128, dls=dl)
        row.update(shard=0, field="content", term_id=tid)
        rows.append(row)
    pdf = pd.DataFrame(rows)
    spec = W.QuerySpec(
        term_weights={("content", 0): 0.05, ("content", 1): 8.0},
        avgdl={"content": AVGDL},
    )
    dw, sw = W.wand(pdf, spec, 10)
    dt, st_ = W.taat(pdf, spec, 10)
    assert np.array_equal(dw, dt)
    np.testing.assert_allclose(sw, st_, rtol=1e-12)


@st.composite
def positional_postings(draw):
    """2-4 phrase terms with per-doc sorted position lists (duplicates
    allowed — word-part expansions can share a position)."""
    n_terms = draw(st.integers(2, 4))
    block_size = draw(st.sampled_from([4, 16]))
    rows = []
    pos_map: dict[int, dict[int, list[int]]] = {}
    for t in range(n_terms):
        n = draw(st.integers(1, 25))
        docs = np.array(
            sorted(draw(st.sets(st.integers(0, 60), min_size=n, max_size=n))),
            dtype=np.int64,
        )
        n = docs.size
        positions = [
            sorted(
                draw(
                    st.lists(
                        st.integers(0, 40), min_size=1, max_size=6
                    )
                )
            )
            for _ in range(n)
        ]
        tfs = np.array([len(p) for p in positions], dtype=np.uint64)
        dls = np.full(n, 41, dtype=np.uint64)
        tfn = bm25.tf_norm(tfs.astype(float), dls.astype(float), AVGDL)
        row = encode_postings(
            docs,
            tfs,
            tfn,
            block_size,
            dls=dls,
            positions=[np.asarray(p, dtype=np.int64) for p in positions],
        )
        row.update(shard=0, field="content", term_id=t)
        rows.append(row)
        pos_map[t] = {
            int(d): list(p) for d, p in zip(docs, positions)
        }
    slop = draw(st.integers(0, 4))
    return pd.DataFrame(rows), pos_map, list(range(len(rows))), slop


@given(positional_postings(), st.integers(1, 20))
@settings(max_examples=80, deadline=None)
def test_batched_phrase_matches_per_doc_reference(pp, k):
    """The cross-doc vectorized frontier expansion
    (wand._phrase_freqs_batch via phrase_topk_shard) is value-identical
    to evaluating wand._sloppy_pf doc by doc — the round-2 'no per-doc
    python in a hot path' contract extended to PhraseQuery."""
    pdf, pos_map, tids, slop = pp
    idf_sum, avgdl = 1.7, AVGDL
    got_ids, got_scores = W.phrase_topk_shard(
        pdf, tids, "content", idf_sum, avgdl, k, slop=slop
    )
    # per-doc reference: intersect, then _sloppy_pf per doc
    common = set(pos_map[tids[0]])
    for t in tids[1:]:
        common &= set(pos_map[t])
    ref = []
    for doc in sorted(common):
        pf = W._sloppy_pf(
            [np.asarray(pos_map[t][doc], dtype=np.int64) for t in tids],
            slop,
        )
        if pf > 0.0:
            dl = 41.0
            ref.append(
                (doc, idf_sum * float(bm25.tf_norm(pf, dl, avgdl)))
            )
    ref.sort(key=lambda r: (-r[1], r[0]))
    ref = ref[:k]
    assert got_ids.tolist() == [d for d, _s in ref]
    np.testing.assert_allclose(
        got_scores, [s for _d, s in ref], rtol=1e-9
    )
