"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
MOSS): selection correctness vs a naive replay, the shared-run
guarantee, the rightmost tie-break, and the count-gated overlap pairs."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

K, W = 5, 4


def _md5h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _naive(text: str, k: int = K, window: int = W) -> set[tuple[int, int]]:
    """Reference winnowing: min by (hash asc, pos desc) per window."""
    toks = text.split()
    grams = [(_md5h(" ".join(toks[i:i + k])), -(i + 1), i + 1)
             for i in range(len(toks) - k + 1)]
    if not grams:
        return set()
    sel = set()
    for s in range(max(len(grams) - window + 1, 1)):
        h, _, pos = min(grams[s:s + window])
        sel.add((pos, h))
    return sel


def _spark_fps(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    rows = dedup.winnow_fingerprints(df, k=K, window=W,
                                     portable=True).collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    return out


WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(WORDS, min_size=0, max_size=30), min_size=1,
                max_size=4))
def test_winnow_matches_naive_replay(spark, docs):
    texts = [" ".join(ws) for ws in docs]
    got = _spark_fps(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _naive(t), t


def test_winnow_shared_run_guarantee(spark):
    """Any shared run of >= k + window - 1 words yields at least one
    shared fingerprint HASH (the paper's guarantee), regardless of the
    differing surroundings."""
    run = "r1 r2 r3 r4 r5 r6 r7 r8"  # k + window - 1 = 8 words
    a = "x1 x2 x3 " + run + " y1 y2"
    b = "z1 " + run + " q1 q2 q3 q4"
    got = _spark_fps(spark, [a, b])
    fa = {h for _, h in got[0]}
    fb = {h for _, h in got[1]}
    assert fa & fb


def test_winnow_rightmost_tiebreak(spark):
    """A repeated gram (identical hash) inside one window selects the
    RIGHTMOST occurrence — the paper's robust-winnowing rule."""
    # 'a b c d e' at positions 1 and 2 (six tokens, duplicated gram):
    text = "a b c d e a b c d e"
    got = _spark_fps(spark, [text])[0]
    naive = _naive(text)
    assert got == naive
    # positions of the minimal hash must include a rightmost-selected one
    toks = text.split()
    grams = [(_md5h(" ".join(toks[i:i + K])), i + 1)
             for i in range(len(toks) - K + 1)]
    hmin = min(h for h, _ in grams)
    dup_positions = [p for h, p in grams if h == hmin]
    if len(dup_positions) > 1:
        window_sel = {p for p, h in got if h == hmin}
        assert max(dup_positions) in window_sel


def test_winnow_short_docs(spark):
    got = _spark_fps(spark, [
        "a b c",                # < k words: no fingerprints
        "a b c d e f",          # 2 grams < window: one whole-doc window
    ])
    assert 0 not in got
    assert len(got[1]) == 1


def test_winnow_overlap_count_gate(spark):
    """min_shared gates on absolute shared-fingerprint count: a 24-word
    splice shared between two otherwise-different docs must pair (the
    covering guarantee gives >= 5 shared), while docs sharing only a
    single k-gram must not."""
    splice = " ".join(f"s{j}" for j in range(24))
    rows = [
        (0, "u1 u2 u3 u4 u5 u6 " + splice),
        (1, splice + " v1 v2 v3 v4 v5 v6 v7 v8"),
        (2, "w1 w2 a b c d e w3 w4 w5 w6 w7 w8 w9"),
        (3, "t1 t2 a b c d e t3 t4 t5 t6 t7 t8 t9"),  # shares one 5-gram with 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.winnow_overlap_pairs(
        df, min_shared=5, max_bucket_size=None, portable=True).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    loose = dedup.winnow_overlap_pairs(
        df, min_shared=1, max_bucket_size=None, portable=True).collect()
    assert {(p.id_a, p.id_b) for p in loose} >= {(0, 1), (2, 3)}


def test_winnow_dedup_against_store(spark):
    """A new doc splicing a passage already in the store drops; a fresh
    doc and a too-short doc survive; the store never sees new text."""
    splice = " ".join(f"s{j}" for j in range(24))
    seen = spark.createDataFrame(
        [(100, "old1 old2 " + splice + " old3")],
        "doc_id long, text string")
    store = dedup.winnow_fingerprints(seen, portable=True).select("fp")
    new = spark.createDataFrame([
        (0, "n1 n2 n3 n4 " + splice),          # splices the seen passage
        (1, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"),  # fresh content
        (2, "a b"),                             # too short to fingerprint
    ], "doc_id long, text string")
    kept = dedup.winnow_dedup_against(
        new, store, min_shared=5, portable=True)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
