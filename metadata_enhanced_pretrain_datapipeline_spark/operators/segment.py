"""Order-dependent segmentation (SURVEY.md §2.9 W1) and sessionization.

W1 (ParaDocs consecutive-block segmentation, reference paradocs.py:13-91)
is the canonical "sequential fold" operator: blocks break on invalid rows,
id changes, index gaps, OR when the *running concatenated length* would
exceed max_length. The running-length cap is not expressible as
lag/sum windows (the reset depends on the fold state), so the engine runs
it as `applyInPandas` partitioned by document — each group is one document's
sentence stream, small by construction, so group skew is bounded and the
single shuffle is keyed by doc id.

The SQL-expressible 90% (gap/id-change breaks without the length cap) is
also provided (`session_breaks`) — that variant IS oracle-checkable and is
what `q_session_window` uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def session_breaks(df: DataFrame, part_col: str, ts_col: str,
                   gap_seconds: int) -> DataFrame:
    """Gap-based sessionization via lag + running sum of break flags — the
    classic islands construction; one shuffle (window partitioned by key).
    Returns the input plus a `session_id` (0-based per key)."""
    w = Window.partitionBy(part_col).orderBy(ts_col)
    # integer microseconds keep full precision (unix_timestamp would truncate
    # to whole seconds and disagree with µs oracles on gaps in (gap, gap+1));
    # the cast("timestamp") makes this accept TIMESTAMP_NTZ parquet columns
    # too — Spark 4 rejects NTZ→DOUBLE, and the session tz is pinned to UTC
    # (session.py) so NTZ→LTZ is an exact identity offset
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    brk = F.when(
        prev.isNull() | (us - prev > F.lit(gap_seconds) * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn("__brk", brk).withColumn(
        "session_id", F.sum("__brk").over(w) - 1
    ).drop("__brk")


def segment_blocks(df: DataFrame, doc_col: str, order_col: str, text_col: str,
                   max_length: int, valid_col: str | None = None,
                   max_gap: int = 2) -> DataFrame:
    """W1 — consecutive-block segmentation with a running length cap
    (reference paradocs.py:13-91 semantics):

    start a new block when (a) the row is invalid — the row also breaks and
    is dropped (paradocs.py:22-33), (b) order indices jump by more than
    ``max_gap`` (paradocs.py:13-20), or (c) appending the row's text would
    push the concatenated block text past ``max_length`` (paradocs.py:74-77).
    A single row longer than ``max_length`` becomes its own oversized block
    — valid rows are never dropped; the cap bounds only concatenation.

    Emits one row per block: (doc, block_id, text, n_rows). applyInPandas
    per doc — see module docstring for why this is the right physical shape.
    """
    doc_type = dict(df.dtypes)[doc_col]
    out_schema = f"{doc_col} {doc_type}, block_id int, text string, n_rows int"
    sep_len = 1  # rows join with a single space, like ' '.join

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        # column arrays + a plain loop: pandas iterrows() materializes a
        # Series per row and is ~30x slower on the same fold
        doc_val = pdf[doc_col].iloc[0]
        idxs = pdf[order_col].to_numpy()
        texts = pdf[text_col].to_numpy()
        valids = pdf[valid_col].to_numpy() if valid_col is not None else None

        blocks, cur, cur_len, prev_idx = [], [], 0, None
        block_id = 0

        def flush():
            nonlocal cur, cur_len, block_id
            if cur:
                blocks.append((doc_val, block_id, " ".join(cur), len(cur)))
                block_id += 1
            cur, cur_len = [], 0

        for i in range(len(idxs)):
            if valids is not None and not bool(valids[i]):
                flush()  # invalid row breaks the block and is dropped
                prev_idx = None
                continue
            idx = idxs[i]
            gap_break = prev_idx is not None and (idx - prev_idx) > max_gap
            text = texts[i] or ""
            add = len(text) if not cur else cur_len + sep_len + len(text)
            if gap_break or (cur and add > max_length):
                flush()
                add = len(text)
            # an oversized single row still starts its own (oversized)
            # block — valid rows are NEVER dropped (paradocs.py:13-91
            # parity; blocks only cap the CONCATENATION)
            cur.append(text)
            cur_len = add
            prev_idx = idx
        flush()
        return pd.DataFrame(
            blocks, columns=[doc_col, "block_id", "text", "n_rows"]
        )

    return df.groupBy(doc_col).applyInPandas(fold, schema=out_schema)
