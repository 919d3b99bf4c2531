import glob

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.schema import expand_metadata, to_documents
from metadata_enhanced_pretrain_datapipeline_spark.sources import readers, writers


def test_to_documents_adapter_merges_metadata(spark):
    """S7 adapter semantics (finemath/main.py:46-66): JSON metadata decoded,
    leftover columns merged over it."""
    df = spark.createDataFrame(
        [("7", "body", '{"url": "http://x", "keep": "yes"}', "en")],
        "id string, text string, metadata string, lang string",
    )
    out = to_documents(df, metadata_cols=["lang"], metadata_json_col="metadata").collect()[0]
    assert out.id == "7" and out.text == "body"
    assert out.metadata == {"url": "http://x", "keep": "yes", "lang": "en"}


def test_expand_metadata(spark):
    df = spark.createDataFrame(
        [("1", "t", None, {"url": "u", "score": "3"})],
        "id string, text string, media array<string>, metadata map<string,string>",
    )
    out = expand_metadata(df, ["url", "score"]).collect()[0]
    assert out.url == "u" and out.score == "3"


def test_paradocs_tsv_reader(spark, tmp_path):
    line = "\t".join(["hi", "ho", "0.9", "0.8", "c", "1", "1", "5", "5",
                      "0", "2", "0", "2", "0.99", "0.98", "1.0", "42", "43"])
    p = tmp_path / "x.tsv"
    p.write_text(line + "\n")
    df = readers.read_paradocs_tsv(spark, str(p))
    row = df.collect()[0]
    assert row.src == "hi" and row.src_docid == "42"
    assert len(df.columns) == 18


def test_write_parquet_expand_and_shard(spark, tmp_path, docs):
    out = str(tmp_path / "out")
    d = docs.withColumn("metadata", F.create_map(F.lit("k"), F.lit("v")))
    writers.write_parquet(d, out, max_records_per_file=10, metadata_as_json=True)
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 4  # 40 rows / 10 per file
    back = spark.read.parquet(out)
    assert back.count() == 40
    assert dict(back.dtypes)["metadata"] == "string"  # JSON round-trip


def test_write_fasttext(spark, tmp_path, docs):
    out = str(tmp_path / "ft")
    writers.write_fasttext(docs.withColumn("label", F.col("doc_id") % 2), out)
    lines = spark.read.text(out).collect()
    assert len(lines) == 40 and all(r.value.startswith("__label__") for r in lines)


def test_read_hf_snapshot_layouts(spark, tmp_path):
    import pandas as pd

    # hub layout A: data/{split}-00000-of-00001.parquet
    a = tmp_path / "dsA" / "data"
    a.mkdir(parents=True)
    pd.DataFrame({"content": ["hello world", "zwei drei"], "id": ["a", "b"]}).to_parquet(
        a / "train-00000-of-00001.parquet")
    out = readers.read_hf_snapshot(spark, str(tmp_path / "dsA"), text_key="content",
                                   split="train")
    assert out.columns[0] in ("text", "id") and out.count() == 2
    assert {r.text for r in out.select("text").collect()} == {"hello world", "zwei drei"}

    # layout B: {split}/*.parquet, with the Document adapter
    b = tmp_path / "dsB" / "test"
    b.mkdir(parents=True)
    pd.DataFrame({"content": ["x y"], "id": ["c"], "lang": ["en"]}).to_parquet(
        b / "part0.parquet")
    docs = readers.read_hf_snapshot(spark, str(tmp_path / "dsB"), text_key="content",
                                    split="test", id_col="id")
    row = docs.collect()[0]
    assert row.text == "x y" and row.id == "c"

    # missing split raises
    import pytest
    with pytest.raises(FileNotFoundError):
        readers.read_hf_snapshot(spark, str(tmp_path / "dsA"), split="validation")


def test_warc_parser_records_skip_and_errors(spark, tmp_path):
    import gzip

    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.sources import readers, writers

    recs = (writers.warcinfo_record()
            + writers.wet_record("https://x/1", "2026-01-01T00:00:00Z",
                                 "hello world")
            + writers.wet_record("https://x/2", "2026-01-01T00:00:00Z",
                                 "héllo ünïcode"))  # multi-byte lengths
    got = list(readers._iter_warc_records(recs))
    assert [h.get("warc-type") for h, _ in got] \
        == ["warcinfo", "conversion", "conversion"]
    assert got[2][1].decode("utf-8") == "héllo ünïcode"
    # truncated content must raise, not silently under-parse
    with pytest.raises(ValueError, match="truncated"):
        list(readers._iter_warc_records(recs[:-6]))
    with pytest.raises(ValueError, match="version"):
        list(readers._iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))

    # member-per-record gzip: GzipFile must read across members
    gz = b"".join(gzip.compress(p) for p in
                  (writers.warcinfo_record(),
                   writers.wet_record("https://x/3", "d", "abc")))
    p = tmp_path / "t.warc.wet.gz"
    p.write_bytes(gz)
    out = readers.read_wet(spark, str(tmp_path)).collect()
    assert [(r.url, r.text) for r in out] == [("https://x/3", "abc")]
    everything = readers.read_wet(spark, str(tmp_path),
                                  record_type=None).count()
    assert everything == 2  # warcinfo visible only when asked for


def test_read_warc_binary_content(spark, tmp_path):
    from metadata_enhanced_pretrain_datapipeline_spark.sources import readers

    body = bytes(range(256))
    hdr = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://x/bin\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    (tmp_path / "r.warc").write_bytes(hdr + body + b"\r\n\r\n")
    out = readers.read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 1 and bytes(out[0].content) == body


def test_warc_response_record_roundtrip(spark, tmp_path):
    """read_warc + http_body_str recover the exact HTML body from a
    warc_response_record — the crawl front door's first two steps."""
    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.sources import readers, writers

    html = "<html><body><p>héllo &amp; wörld</p></body></html>"
    rec = writers.warc_response_record("https://x/1",
                                       "2026-01-01T00:00:00Z", html)
    (tmp_path / "r.warc").write_bytes(writers.warcinfo_record() + rec)
    out = readers.read_warc(spark, str(tmp_path))
    got = out.select("url",
                     readers.http_body_str(F.col("content")).alias("body")
                     ).collect()
    assert [(r.url, r.body) for r in got] == [("https://x/1", html)]
    # the HTTP header block is metadata, not corpus text
    raw = bytes(out.head().content)
    assert raw.startswith(b"HTTP/1.1 200 OK\r\n")
