"""Tokenization, sequence packing, and the Megatron binary sink
(SURVEY.md §2.9 W2 / §2.2 K4).

The tokenizer is a whitespace+vocab-hash stub (real BPE libs aren't in the
container); the packing and binary-format logic — the part the reference
actually implements (megatron_tokenizer.py:78-204,
megatron_tokenizer_context.py:210-356) — is real.

Physical shape for W2 packing: the running `offset_in_sequence` carries
ACROSS documents (megatron_tokenizer_context.py:301-324), so output depends
on document order. We pin order with repartitionByRange(shard).
sortWithinPartitions(order) and fold per partition with mapPartitions;
each partition ≡ one reference rank, which also starts fresh at offset 0
(megatron_tokenizer_context.py:262) — parity documented.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import md5_hash64
from metadata_enhanced_pretrain_datapipeline_spark.functions.text import tokens_ws


def tokenize_ws(text: Column, vocab_size: int = 50000) -> Column:
    """Stub tokenizer: whitespace words → deterministic int ids via the
    portable hash (mod vocab). JVM-side; stands in for tokenizer.encode_batch
    (megatron_tokenizer.py:236).

    Tokenization semantics (incl. the empty-text guard) live in
    functions/text.tokens_ws — single source of truth."""
    return F.transform(
        tokens_ws(text), lambda w: (md5_hash64(w) % F.lit(vocab_size)).cast("int")
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """G6 — per-doc token counts + the stats the reference accumulates per
    rank and merges (stat_update("tokens", ...), megatron_tokenizer.py:283;
    merge job slurm_nodes.py:199-220). In Spark the merge job disappears:
    one agg."""
    return df.withColumn("n_tokens", F.size(tokenize_ws(F.col(text_col))))


def pack_sequences(df: DataFrame, order_col: str, text_col: str = "text",
                   seq_len: int = 4096, pad_id: int = 1,
                   shards: int = 8) -> DataFrame:
    """W2 — stateful sequence packing: concatenate token streams doc-after-
    doc into fixed seq_len sequences, carrying the offset across documents
    (megatron_tokenizer_context.py:283-334); pad the final partial sequence
    with pad_id (=1, :302).

    Returns (shard, seq_idx, tokens array<int>, n_pad). Deterministic: shard
    = hash-bucket of order key ranges; docs sorted within shard.
    """
    toks = df.select(
        (md5_hash64(F.col(order_col)) % F.lit(shards)).alias("shard"),
        F.col(order_col).alias("__ord"),
        tokenize_ws(F.col(text_col)).alias("toks"),
    )
    arranged = toks.repartitionByRange(shards, "shard").sortWithinPartitions("shard", "__ord")

    schema = "shard long, seq_idx long, tokens array<int>, n_pad int"

    def fold(rows: Iterator) -> Iterator:
        import pandas as pd

        state: dict[int, list[int]] = {}
        counters: dict[int, int] = {}
        out = []
        for row in rows:
            buf = state.setdefault(row.shard, [])
            buf.extend(row.toks or [])
            while len(buf) >= seq_len:
                out.append((row.shard, counters.get(row.shard, 0), buf[:seq_len], 0))
                counters[row.shard] = counters.get(row.shard, 0) + 1
                del buf[:seq_len]
        for shard, buf in state.items():
            if buf:
                pad = seq_len - len(buf)
                out.append((shard, counters.get(shard, 0), buf + [pad_id] * pad, pad))
        for rec in out:
            yield rec

    rdd = arranged.rdd.mapPartitions(fold)
    return arranged.sparkSession.createDataFrame(rdd, schema)


# ---------------------------------------------------------------------------
# K4 — Megatron .bin/.idx sink. Byte format documented at reference
# megatron_tokenizer.py:119-174: header b"MMIDIDX\x00\x00", version <Q =1,
# dtype code <B (4=int32 ... 8=uint16), <Q sequence count, <Q doc count,
# int32 sequence lengths, int64 pointers, int64 document indices.
# ---------------------------------------------------------------------------

_MAGIC = b"MMIDIDX\x00\x00"


def write_megatron_partition(token_lists: list[list[int]], bin_path: str,
                             idx_path: str, vocab_size: int = 50000) -> int:
    """Write one partition's docs as a .bin/.idx pair. dtype rule mirrors
    megatron_tokenizer.py:54-60,104-107: uint16 if vocab fits, else int32.
    Returns total token count."""
    dtype, code = (np.uint16, 8) if vocab_size < 65500 else (np.int32, 4)
    lengths, pointers, ptr = [], [], 0
    with open(bin_path, "wb") as b:
        for toks in token_lists:
            arr = np.asarray(toks, dtype=dtype)
            b.write(arr.tobytes(order="C"))
            pointers.append(ptr)
            lengths.append(len(toks))
            ptr += arr.nbytes
    with open(idx_path, "wb") as i:
        i.write(_MAGIC)
        i.write(struct.pack("<Q", 1))
        i.write(struct.pack("<B", code))
        i.write(struct.pack("<Q", len(lengths)))
        i.write(struct.pack("<Q", len(lengths) + 1))
        i.write(np.asarray(lengths, dtype=np.int32).tobytes(order="C"))
        i.write(np.asarray(pointers, dtype=np.int64).tobytes(order="C"))
        i.write(np.arange(len(lengths) + 1, dtype=np.int64).tobytes(order="C"))
    return int(sum(lengths))


def write_megatron(df: DataFrame, out_dir: str, text_col: str = "text",
                   order_col: str = "doc_id", shards: int = 4,
                   vocab_size: int = 50000) -> None:
    """Distributed K4 sink: one .bin/.idx pair per shard ≈ per reference
    rank (get_output_filename, megatron_tokenizer.py:207-209).
    foreachPartition writes executor-side; no driver collect."""
    import os

    toks = df.select(
        (md5_hash64(F.col(order_col)) % F.lit(shards)).alias("shard"),
        F.col(order_col).alias("__ord"),
        tokenize_ws(F.col(text_col), vocab_size).alias("toks"),
    ).repartitionByRange(shards, "shard").sortWithinPartitions("shard", "__ord")

    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows: Iterator) -> None:
        by_shard: dict[int, list[list[int]]] = {}
        for row in rows:
            by_shard.setdefault(row.shard, []).append(list(row.toks or []))
        for shard, docs in by_shard.items():
            base = os.path.join(out_dir, f"shard_{shard:05d}")
            write_megatron_partition(docs, base + ".bin", base + ".idx", vocab_size)

    toks.rdd.foreachPartition(write_part)


# ---------------------------------------------------------------------------
# W2 full form — metadata-conditioned packing
# (reference megatron_tokenizer_context.py:210-356, pack loop 283-334):
# inject <BOC> meta <EOC> token runs at sequence-aligned positions, once per
# document or once per sequence; pad with pad_id when a meta run would
# straddle a boundary (:302); truncate meta to 50 chars when longer than a
# sequence (:296-298); offset carries across documents within a shard
# (:301-324; each shard ≈ one reference rank starting fresh, :262).
# ---------------------------------------------------------------------------

BOC_ID = 2
EOC_ID = 3


def pack_with_metadata(df: DataFrame, order_col: str, text_col: str = "text",
                       meta_col: str = "meta", seq_len: int = 4096,
                       pad_id: int = 1, shards: int = 8,
                       per_sequence: bool = False,
                       meta_max_chars: int = 50,
                       vocab_size: int = 50000) -> DataFrame:
    """Returns (shard, seq_idx, tokens array<int>, n_pad, n_meta_tokens).

    Meta runs are [BOC_ID, *tokenize(meta), EOC_ID] placed at the start of
    the document (default) or re-injected at the start of every sequence a
    document spans (``per_sequence``, :314-322). A run never straddles a
    boundary: if it does not fit in the current sequence's remainder, the
    remainder is padded and the run starts the next sequence (:302).
    """
    toks = df.select(
        (md5_hash64(F.col(order_col)) % F.lit(shards)).alias("shard"),
        F.col(order_col).alias("__ord"),
        tokenize_ws(F.col(text_col), vocab_size).alias("toks"),
        tokenize_ws(F.substring(F.col(meta_col), 1, meta_max_chars), vocab_size).alias("mtoks"),
    )
    arranged = toks.repartitionByRange(shards, "shard").sortWithinPartitions("shard", "__ord")

    schema = "shard long, seq_idx long, tokens array<int>, n_pad int, n_meta_tokens int"

    def fold(rows: Iterator) -> Iterator:
        bufs: dict[int, list[int]] = {}
        meta_counts: dict[int, int] = {}
        pad_counts: dict[int, int] = {}
        counters: dict[int, int] = {}
        out = []

        def emit_full(shard: int):
            buf = bufs[shard]
            while len(buf) >= seq_len:
                # pads injected by the straddle path always complete the
                # FIRST sequence emitted after them — attribute them there
                n_pad = pad_counts.pop(shard, 0)
                out.append((shard, counters.get(shard, 0), buf[:seq_len], n_pad,
                            meta_counts.get(shard, 0)))
                counters[shard] = counters.get(shard, 0) + 1
                meta_counts[shard] = 0
                del buf[:seq_len]

        for row in rows:
            shard = row.shard
            buf = bufs.setdefault(shard, [])
            meta_run = [BOC_ID, *(row.mtoks or []), EOC_ID]
            if len(meta_run) > seq_len:  # truncate pathological meta (:296-298)
                meta_run = meta_run[: seq_len - 1] + [EOC_ID]

            def inject():
                room = seq_len - (len(buf) % seq_len)
                if room < len(meta_run):  # would straddle -> pad out (:302)
                    buf.extend([pad_id] * room)
                    pad_counts[shard] = pad_counts.get(shard, 0) + room
                    emit_full(shard)
                buf.extend(meta_run)
                meta_counts[shard] = meta_counts.get(shard, 0) + len(meta_run)

            if per_sequence:
                # inject at doc start and at every boundary the doc crosses
                inject()
                for t in row.toks or []:
                    if len(buf) % seq_len == 0 and len(buf) > 0:
                        emit_full(shard)
                        inject()
                    buf.append(t)
            else:
                inject()
                buf.extend(row.toks or [])
            emit_full(shard)

        for shard, buf in bufs.items():
            if buf:
                pad = seq_len - len(buf) + pad_counts.pop(shard, 0)
                out.append((shard, counters.get(shard, 0),
                            buf + [pad_id] * (seq_len - len(buf)), pad,
                            meta_counts.get(shard, 0)))
        for rec in out:
            yield rec

    rdd = arranged.rdd.mapPartitions(fold)
    return arranged.sparkSession.createDataFrame(rdd, schema)


def write_megatron_packed(df: DataFrame, out_dir: str, order_col: str = "doc_id",
                          text_col: str = "text", seq_len: int = 4096,
                          shards: int = 4, vocab_size: int = 50000) -> None:
    """K4 ∘ W2 — the reference's actual flow: tokenize → pack into fixed
    seq_len sequences → write one .bin/.idx pair per shard, each packed
    sequence one Megatron 'document' (megatron_tokenizer_context.py:210-356
    feeding MegatronTokenizedFile). Executor-side writes, no driver collect."""
    import os

    packed = pack_sequences(df, order_col, text_col, seq_len=seq_len, shards=shards)
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows: Iterator) -> None:
        by_shard: dict[int, list[tuple[int, list[int]]]] = {}
        for row in rows:
            by_shard.setdefault(row.shard, []).append((row.seq_idx, list(row.tokens)))
        for shard, seqs in by_shard.items():
            seqs.sort()
            base = os.path.join(out_dir, f"shard_{shard:05d}")
            write_megatron_partition([t for _, t in seqs], base + ".bin", base + ".idx",
                                     vocab_size)

    packed.repartition(shards, "shard").rdd.foreachPartition(write_part)
