import struct

import numpy as np
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import tokens


def test_pack_conserves_tokens(spark, docs):
    n_tokens = docs.select(
        F.sum(F.size(tokens.tokenize_ws(F.col("text")))).alias("n")
    ).collect()[0].n
    packed = tokens.pack_sequences(docs, "doc_id", seq_len=64, shards=3)
    rows = packed.collect()
    total = sum(len(r.tokens) for r in rows)
    pad = sum(r.n_pad for r in rows)
    assert all(len(r.tokens) == 64 for r in rows)  # every sequence aligned
    assert total - pad == n_tokens  # non-pad tokens conserved
    # at most one partial (padded) sequence per shard (W2 property, §5.3)
    by_shard = {}
    for r in rows:
        if r.n_pad > 0:
            by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
    assert all(v == 1 for v in by_shard.values())


def test_pack_deterministic(spark, docs):
    a = sorted(map(tuple, tokens.pack_sequences(docs, "doc_id", seq_len=64, shards=3)
                   .select("shard", "seq_idx", "n_pad").collect()))
    b = sorted(map(tuple, tokens.pack_sequences(docs, "doc_id", seq_len=64, shards=3)
                   .select("shard", "seq_idx", "n_pad").collect()))
    assert a == b


def test_megatron_idx_format_golden(tmp_path):
    """Byte-exact .idx spec (reference megatron_tokenizer.py:119-174):
    MMIDIDX magic, <Q version=1, <B dtype code, <Q counts, int32 lengths,
    int64 pointers, int64 doc indices."""
    docs = [[1, 2, 3], [4, 5]]
    bin_p, idx_p = str(tmp_path / "t.bin"), str(tmp_path / "t.idx")
    total = tokens.write_megatron_partition(docs, bin_p, idx_p, vocab_size=50000)
    assert total == 5
    raw = open(idx_p, "rb").read()
    assert raw[:9] == b"MMIDIDX\x00\x00"
    off = 9
    (version,) = struct.unpack_from("<Q", raw, off); off += 8
    (code,) = struct.unpack_from("<B", raw, off); off += 1
    (n_seq,) = struct.unpack_from("<Q", raw, off); off += 8
    (n_doc,) = struct.unpack_from("<Q", raw, off); off += 8
    assert (version, code, n_seq, n_doc) == (1, 8, 2, 3)
    lengths = np.frombuffer(raw, dtype=np.int32, count=2, offset=off); off += 8
    pointers = np.frombuffer(raw, dtype=np.int64, count=2, offset=off); off += 16
    docidx = np.frombuffer(raw, dtype=np.int64, count=3, offset=off)
    assert lengths.tolist() == [3, 2]
    assert pointers.tolist() == [0, 6]  # uint16 -> 3 tokens = 6 bytes
    assert docidx.tolist() == [0, 1, 2]
    # bin payload: uint16 little-endian token ids
    payload = np.frombuffer(open(bin_p, "rb").read(), dtype=np.uint16)
    assert payload.tolist() == [1, 2, 3, 4, 5]


def test_write_megatron_distributed(spark, docs, tmp_path):
    out = str(tmp_path / "meg")
    tokens.write_megatron(docs, out, shards=2)
    import glob
    bins = sorted(glob.glob(out + "/*.bin"))
    idxs = sorted(glob.glob(out + "/*.idx"))
    assert len(bins) == 2 and len(idxs) == 2


def test_write_megatron_packed(spark, docs, tmp_path):
    out = str(tmp_path / "megp")
    tokens.write_megatron_packed(docs, out, seq_len=64, shards=2)
    import glob
    idxs = sorted(glob.glob(out + "/*.idx"))
    assert len(idxs) == 2
    # every packed doc is exactly seq_len tokens
    for idx in idxs:
        raw = open(idx, "rb").read()
        (n_seq,) = struct.unpack_from("<Q", raw, 18)
        lengths = np.frombuffer(raw, dtype=np.int32, count=n_seq, offset=34)
        assert all(l == 64 for l in lengths)


def test_read_megatron_rejects_bad_magic(tmp_path):
    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.operators.tokens import read_megatron_partition

    bad = tmp_path / "corrupt.idx"
    bad.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
    (tmp_path / "corrupt.bin").write_bytes(b"\x00" * 8)
    with pytest.raises(ValueError, match="bad magic"):
        read_megatron_partition(str(tmp_path / "corrupt.bin"), str(bad))
