"""Hypothesis property tests for the order-dependent operators (SURVEY §5.2):
W1 segmentation and W2 packing invariants must hold for ARBITRARY inputs,
not just the fixtures."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metadata_enhanced_pretrain_datapipeline_spark.operators import segment, tokens

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),            # doc
        st.integers(0, 30),           # idx
        st.text(alphabet="abcd", min_size=0, max_size=12),  # txt
        st.booleans(),                # ok
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@_slow
@given(rows=rows_strategy, max_length=st.integers(4, 40))
def test_segment_blocks_invariants(spark, rows, max_length):
    df = spark.createDataFrame(rows, "doc long, idx long, txt string, ok boolean") \
        if rows else spark.createDataFrame([], "doc long, idx long, txt string, ok boolean")
    out = segment.segment_blocks(df, "doc", "idx", "txt", max_length=max_length,
                                 valid_col="ok", max_gap=2).collect()
    # 1. no MULTI-ROW block exceeds max_length (a single oversized row is
    #    its own block, never dropped — paradocs parity)
    assert all(len(r.text) <= max_length for r in out if r.n_rows > 1)
    # 2. valid rows are conserved exactly
    valid = [t for t in rows if t[3]]
    assert sum(r.n_rows for r in out) == len(valid)
    # 3. every block belongs to an input doc
    assert {r.doc for r in out} <= {t[0] for t in rows}


texts_strategy = st.lists(
    st.text(alphabet="xyz ", min_size=0, max_size=40), min_size=1, max_size=15
)


@_slow
@given(texts=texts_strategy, seq_len=st.integers(4, 64))
def test_pack_sequences_invariants(spark, texts, seq_len):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tokens.pack_sequences(df, "doc_id", seq_len=seq_len, shards=2).collect()
    n_tokens = sum(len(t.split()) for t in texts)
    # every sequence exactly seq_len; non-pad tokens conserved
    assert all(len(r.tokens) == seq_len for r in out)
    assert sum(len(r.tokens) - r.n_pad for r in out) == n_tokens
    # seq_idx dense per shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.seq_idx)
    for idxs in by_shard.values():
        assert sorted(idxs) == list(range(len(idxs)))
