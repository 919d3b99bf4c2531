"""The Document data model, Spark-native.

The reference's unit of data is the datatrove ``Document``:
``{"text": str, "id": str, "media": list, "metadata": dict}``
(adapter shape at reference pipelines/finemath/main.py:60-66; same shape in
pipelines/provenance-flan/main.py:46-51, pipelines/euroblocks/main.py:37-42).

Our mapping (SURVEY.md §1.5): a DataFrame with a fixed core schema plus
*promoted* typed columns for hot metadata keys. The open-ended remainder of
``metadata`` stays in a ``map<string,string>``; ``from_json``/``to_json`` at
the boundary reproduces the reference's JSON-string metadata round-trip
(finemath/main.py:64,74).

At 100 TB the promoted-column design is what makes Catalyst useful: filters
on ``toxic_score``/``quality_score`` push down to the parquet scan, while a
single opaque JSON blob would force full-row deserialization per predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Core Document columns — always present.
DOCUMENT_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("text", StringType(), nullable=True),
        StructField("media", ArrayType(StringType()), nullable=True),
        StructField("metadata", MapType(StringType(), StringType()), nullable=True),
    ]
)

#: Hot metadata keys promoted to typed top-level columns when present
#: (types observed in the reference — SURVEY.md §1.2). Documentation of
#: the promotion contract: operators emit these names/types directly
#: (annotators/robots/formatters), and promote_metadata() below applies
#: the typed casts when adapting foreign data.
PROMOTED_METADATA = StructType(
    [
        StructField("url", StringType()),
        StructField("embeddings", ArrayType(ArrayType(FloatType()))),
        StructField("toxic_score", DoubleType()),
        StructField("quality_score", DoubleType()),
        StructField("pii_count", IntegerType()),
        StructField("pii_list", ArrayType(StringType())),
        StructField("disallowed_user_agents", ArrayType(StringType())),
        StructField("clarity", IntegerType()),
        StructField("educational", IntegerType()),
        StructField("practice", IntegerType()),
        StructField("difficulty", IntegerType()),
        StructField("quality", IntegerType()),
        StructField("weborganizer_topic", StringType()),
        StructField("weborganizer_format", StringType()),
        StructField("int_score", IntegerType()),
    ]
)


def to_documents(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    metadata_cols: list[str] | None = None,
    metadata_json_col: str | None = None,
) -> DataFrame:
    """Normalize an arbitrary input DataFrame into the Document shape.

    This is the reader *adapter* (reference finemath/main.py:46-66): pick
    id/text, JSON-decode a pre-existing ``metadata`` string column if given,
    and merge the leftover named columns into the metadata map — the
    ``json.loads(data.pop("metadata","{}")) | data`` semantics, expressed as
    ``map_concat(from_json(...), map(...))`` so it stays JVM-side.
    """
    metadata_cols = metadata_cols or []
    leftover = F.create_map(
        *[x for c in metadata_cols for x in (F.lit(c), F.col(c).cast("string"))]
    ) if metadata_cols else F.create_map()
    if metadata_json_col is not None:
        decoded = F.from_json(F.col(metadata_json_col), MapType(StringType(), StringType()))
        decoded = F.coalesce(decoded, F.create_map())
        if metadata_cols:
            # last-wins merge (json.loads(...) | data): drop JSON keys the
            # leftover columns override — map_concat under the default
            # mapKeyDedupPolicy=EXCEPTION would otherwise crash on overlap
            override = F.array(*[F.lit(c) for c in metadata_cols])
            decoded = F.map_filter(decoded, lambda k, _: ~F.array_contains(override, k))
        meta = F.map_concat(decoded, leftover)
    else:
        meta = leftover
    # carry an existing media column through (the reference Document shape
    # includes it) — but only when it is already array-typed: casting a
    # string/map media column to array<string> is an invalid cast that
    # would crash inputs that previously adapted cleanly
    media_type = dict(df.dtypes).get("media", "")
    media = (F.col("media").cast(ArrayType(StringType()))
             if media_type.startswith("array<") and "media" not in metadata_cols
             else F.lit(None).cast(ArrayType(StringType())))
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).cast("string").alias("text"),
        media.alias("media"),
        meta.alias("metadata"),
    )


def promote_metadata(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Promote metadata map entries to their TYPED top-level columns per
    PROMOTED_METADATA — the pushdown contract: a promoted column is
    scannable and filterable at the parquet layer without decoding the
    map. Atomic types cast directly; nested types (embeddings, pii_list)
    parse via from_json. Unknown keys are ignored, as are keys already
    present as top-level columns (promoting twice, or promoting over an
    operator-emitted column, must not create a duplicate name)."""
    from pyspark.sql.types import AtomicType

    fields = {f.name: f.dataType for f in PROMOTED_METADATA.fields}
    existing = set(df.columns)
    keys = [k for k in (keys or fields) if k in fields and k not in existing]
    cols = []
    for k in keys:
        raw = F.element_at(F.col("metadata"), k)
        t = fields[k]
        cols.append(
            (raw.cast(t) if isinstance(t, AtomicType) else F.from_json(raw, t)).alias(k)
        )
    return df.select("*", *cols)


def expand_metadata(df: DataFrame, keys: list[str]) -> DataFrame:
    """Re-expand metadata map entries into top-level string columns
    (writer option ``expand_metadata=True``, reference
    provenance-flan/main.py:68-73)."""
    cols = [F.element_at(F.col("metadata"), k).alias(k) for k in keys]
    return df.select("*", *cols)


def metadata_to_json(df: DataFrame) -> DataFrame:
    """Serialize the metadata map back to one JSON string column (writer
    adapter semantics, reference finemath/main.py:69-75)."""
    return df.withColumn("metadata", F.to_json("metadata"))


def doc_ids_per_file(df: DataFrame, id_prefix_col: Column | None = None) -> DataFrame:
    """Assign per-file sequential ids like the reference readers do
    (``id_in_file`` in adapters, finemath/main.py:60): a row_number within
    each input file. Scale note: window is partitioned by file, so no global
    sort — each file's rows stay on their scan partition."""
    from pyspark.sql.window import Window

    # input_file_name() is only defined on the scan's own partitions — it
    # returns '' after any Exchange, so capture it into a column FIRST and
    # window over the captured value (confirmed: windowing over the raw
    # expression loses every file prefix).
    with_file = df.withColumn("__file", F.input_file_name()).withColumn(
        "__seq", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("__file").orderBy("__seq")
    prefix = id_prefix_col if id_prefix_col is not None else F.col("__file")
    return with_file.withColumn(
        "id", F.concat_ws("/", prefix, (F.row_number().over(w) - F.lit(1)).cast("string"))
    ).drop("__file", "__seq")
