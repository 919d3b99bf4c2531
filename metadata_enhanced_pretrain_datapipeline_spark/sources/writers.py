"""Sinks (K1-K5).

K1 parity: zstd parquet with a rolling size cap. The reference rolls files
at max_file_size=1 GiB (fineweb/main.py:144-148); Spark's equivalent knob
is `maxRecordsPerFile` plus partition sizing — same outcome (bounded
shards), expressed declaratively.

WRITER CONTRACT — FileOutputCommitter v2 (session.py): every session
built by ``get_spark`` commits task output DIRECTLY to the destination
directory (no job-commit merge), trading job-abort atomicity for the
many-directory store writes' speed. Consequence for ANY writer added to
this package: a failed/aborted job can leave PARTIAL FILES at the target
path. Every current store writer absorbs this with the write-then-swap
discipline (write to a fresh path, verify, then swap/point readers —
see compact_band_store / compact_ivf_quantized_store); a new writer that
streams straight into a live, reader-visible path inherits
partial-file-on-abort semantics and must either follow the same swap
discipline or override the committer for its write
(``spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=1`` on
a dedicated session). Do not remove this note without re-auditing
session.py's committer conf (VERDICT r12 item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.schema import expand_metadata, metadata_to_json


def write_parquet(df: DataFrame, path: str, max_records_per_file: int | None = None,
                  expand_metadata_keys: list[str] | None = None,
                  metadata_as_json: bool = False, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """K1 — ParquetWriter: zstd, bounded shard size, optional
    expand_metadata (provenance-flan/main.py:68-73) or JSON-string metadata
    (finemath/main.py:69-75)."""
    if expand_metadata_keys:
        df = expand_metadata(df, expand_metadata_keys)
    if metadata_as_json and "metadata" in df.columns:
        df = metadata_to_json(df)
    w = df.write.mode(mode).option("compression", "zstd")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """K2 — JsonlWriter (provenance-flan/main.py:7; create_excerpt.py:144-151).
    ``compression='gzip'`` emits .json.gz shards (the reference's
    output_folder compression=gzip flag)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_fasttext(df: DataFrame, path: str, label_col: str = "label",
                   text_col: str = "text", mode: str = "overwrite") -> None:
    """K5 — fasttext training-file sink: '__label__<k> <text>' lines
    (code_processing.py:80-111)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.formatters import fasttext_line

    df.select(fasttext_line(F.col(label_col), F.col(text_col)).alias("value")) \
        .write.mode(mode).text(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None) -> None:
    """Bucketed managed-table write for co-located joins: two tables
    bucketed identically on the join key join WITHOUT a shuffle — the
    pre-partitioning strategy for repeated fact⋈fact joins at 100 TB
    (the engine's substitute for the reference's one-file-per-rank layout).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              compression: str = "zstd") -> None:
    """ORC sink (engine extension; zstd like the parquet writer — K1's
    compression parity, fineweb/main.py:144-148)."""
    df.write.mode(mode).option("compression", compression).orc(path)


def wet_record(url: str, date: str, text: str) -> bytes:
    """One WARC ``conversion`` record (the WET payload unit), byte-exact:
    version line, headers, CRLFCRLF, Content-Length BYTES of UTF-8
    content, record separator. Pairs with readers.read_wet; gzip each
    record separately for the standard multi-member WET layout."""
    body = text.encode("utf-8")
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return hdr + body + b"\r\n\r\n"


def warc_response_record(url: str, date: str, html: str,
                         status: str = "200 OK") -> bytes:
    """One WARC ``response`` record wrapping a full HTTP response (the
    raw-crawl payload unit — what read_warc's default record_type
    selects), byte-exact: WARC headers, CRLFCRLF, then the HTTP
    status line + headers + CRLFCRLF + UTF-8 body. Pairs with
    readers.read_warc + readers.http_body_str; gzip each record
    separately for the standard multi-member layout."""
    body = html.encode("utf-8")
    http = (
        f"HTTP/1.1 {status}\r\n"
        "Content-Type: text/html; charset=UTF-8\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("ascii") + body
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return hdr + http + b"\r\n\r\n"


def warc_binary_response_record(url: str, date: str, body: bytes,
                                content_type: str,
                                status: str = "200 OK") -> bytes:
    """:func:`warc_response_record` for BINARY payloads (image/audio/
    video crawl responses): the HTTP body is raw bytes and the
    Content-Type header carries the media type readers route on
    (readers.http_content_type). Byte-layout identical otherwise, so
    one WARC file can interleave page and media records the way a real
    crawl segment does."""
    http = (
        f"HTTP/1.1 {status}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("ascii") + body
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return hdr + http + b"\r\n\r\n"


def warcinfo_record(info: str = "software: metadata-enhanced-pretrain-datapipeline-spark") -> bytes:
    """The ``warcinfo`` preamble record real WET files start with —
    readers must SKIP it when selecting conversion records."""
    body = (info + "\r\n").encode("utf-8")
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return hdr + body + b"\r\n\r\n"
