"""Readers (S1-S8) — thin, declarative wrappers over spark.read.

Scale notes: every reader keeps Catalyst in charge — schema given up front
where the format needs it (TSV), projection/predicates push to the scan,
and file-parallelism replaces the reference's file-per-Slurm-task model
(slurm_nodes.py:160-197): `spark.sql.files.maxPartitionBytes` decides the
split, AQE coalesces small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from metadata_enhanced_pretrain_datapipeline_spark.schema import to_documents

#: ParaDocs 18-column headerless gzipped TSV layout
#: (reference pipelines/paradocs/preprocessing/paradocs.py:117-134).
PARADOCS_COLUMNS = [
    "src", "tgt", "similarity_one", "similarity_two", "collection",
    "src_paragraph_id", "tgt_paragraph_id", "src_sentence_id",
    "tgt_sentence_id", "src_start_index", "src_end_index",
    "tgt_start_index", "tgt_end_index", "src_language_id",
    "tgt_language_id", "frequency", "src_docid", "tgt_docid",
]


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """S1 — ParquetReader (reference fineweb/main.py:97-99). Column pruning
    via select reaches the scan (ReadSchema), like the reference's explicit
    `columns=` (robots_filter.py:133)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_parquet_documents(spark: SparkSession, path: str, id_col: str = "id",
                           text_col: str = "text",
                           metadata_cols: list[str] | None = None,
                           metadata_json_col: str | None = None) -> DataFrame:
    """S1+S7 — parquet scan with the reader-adapter applied
    (finemath/main.py:46-66)."""
    return to_documents(
        spark.read.parquet(path), id_col, text_col, metadata_cols, metadata_json_col
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """S2 — JsonlReader incl. .gz (provenance-flan/main.py:61-64). Spark's
    json reader handles gzip transparently; give a schema at scale to skip
    the inference pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(spark: SparkSession, path: str, header: bool = True,
             schema: StructType | str | None = None, sep: str = ",") -> DataFrame:
    """S5 — CSV reader (toxicity preprocessing.py:21-25)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_paradocs_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S4 — the 18-column headerless gzipped TSV (paradocs.py:117-134),
    with the numeric coercions of paradocs.py:142-148 applied lazily by
    the caller via try_cast."""
    schema = " string, ".join(PARADOCS_COLUMNS) + " string"
    return spark.read.option("sep", "\t").schema(schema).csv(path)
