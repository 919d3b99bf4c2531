"""Annotators (SURVEY.md §2.4): model scorers, chunking, URL features.

The ML-backed reference annotators (XLM-R embeddings
xlmr_embedding_annotator.py:4-91; MLP quality/toxicity scorers
embeddings_filter.py:44-55, toxic_filter.py:11-89) become Arrow-batched
pandas UDFs with a per-executor model singleton — the Spark idiom for
"load the model once per worker, score in batches" (reference batches
manually at toxic_filter.py:123). Transformer encoders aren't in this
container, so the *encoder* is a clearly-marked deterministic stub while
the Spark plumbing (schema, batching, regrouping) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import positional_dot

# ---------------------------------------------------------------------------
# MLP scorer (reference embeddings_filter.py:44-55: Linear(768,256)+ReLU+
# Linear(256,1)+sigmoid). Weights are deterministic (seeded numpy) — a
# stand-in for the trained checkpoint, same shapes and dataflow.
# ---------------------------------------------------------------------------

_MLP_CACHE: dict[tuple[int, int], tuple[np.ndarray, ...]] = {}


def _mlp_weights(dim: int, hidden: int = 16) -> tuple[np.ndarray, ...]:
    """Per-executor singleton — built once per (dim, hidden) per worker,
    mirroring the reference's per-task model load."""
    key = (dim, hidden)
    if key not in _MLP_CACHE:
        rng = np.random.default_rng(42)
        w1 = rng.standard_normal((dim, hidden)) / np.sqrt(dim)
        b1 = np.zeros(hidden)
        w2 = rng.standard_normal((hidden, 1)) / np.sqrt(hidden)
        b2 = np.zeros(1)
        _MLP_CACHE[key] = (w1, b1, w2, b2)
    return _MLP_CACHE[key]


def mlp_score_udf(dim: int, hidden: int = 16):
    """Vectorized scorer: array<float> → sigmoid(MLP(x)) ∈ (0,1).

    Arrow batches in/out (pandas_udf) — the 10-100× faster path vs
    row-at-a-time UDFs; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch (reference batches 10k,
    embeddings_filter.py:21).
    """

    @pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w1, b1, w2, b2 = _mlp_weights(dim, hidden)
        for s in batches:
            # NULL or wrong-length vectors score NULL instead of crashing
            # the task (np.stack raises on ragged/None input)
            vals = s.to_numpy()
            ok = np.array([v is not None and len(v) == dim for v in vals])
            out = np.full(len(vals), np.nan)
            if ok.any():
                x = np.stack(vals[ok])
                h = np.maximum(x @ w1 + b1, 0.0)
                z = (h @ w2 + b2).ravel()
                out[ok] = 1.0 / (1.0 + np.exp(-z))
            yield pd.Series(out)

    return score


def mlp_quality_filter(df: DataFrame, vec_col: str = "embedding",
                       threshold: float = 0.5, dim: int = 64) -> DataFrame:
    """F6 — EmbeddingBinaryClassifierFilter: score embeddings[0] with the
    MLP, annotate quality_score, KEEP score > threshold
    (reference embeddings_filter.py:13-41)."""
    scored = df.withColumn("quality_score", mlp_score_udf(dim)(F.col(vec_col)))
    return scored.filter(F.col("quality_score") > F.lit(threshold))


def linear_score(vec: Column) -> Column:
    """The SQL-expressible linear scorer (oracle-checkable analogue of the
    MLP): Σ vᵢ·w(i) with w(i) = ((i·37) mod 21 − 10)/10."""
    return positional_dot(
        vec, lambda i: ((i * F.lit(37)) % F.lit(21) - F.lit(10)).cast("double") / F.lit(10.0)
    )


# ---------------------------------------------------------------------------
# Chunking (reference xlmr_embedding_annotator.py:54-61: 512-token windows
# with return_overflowing_tokens → N chunks per doc; regrouped at :78-90).
# ---------------------------------------------------------------------------


def explode_chunks(df: DataFrame, tokens_col: Column, chunk_len: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Split a token array into ⌈n/chunk_len⌉ windows and explode — one row
    per chunk with (id, chunk_idx, chunk). Narrow op: fan-out happens on the
    scan partition, no shuffle."""
    n_chunks = F.ceil(F.size(tokens_col) / F.lit(chunk_len)).cast("int")
    # sequence(0, -1) descends to [0, -1]; empty token arrays get no chunks
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idxs,
        lambda i: F.slice(tokens_col, i * F.lit(chunk_len) + 1, F.lit(chunk_len)),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )


def regroup_chunk_scores(chunked: DataFrame, score_col: str = "score",
                         id_col: str = "doc_id") -> DataFrame:
    """A2/G5 — doc score = max over chunk scores (reference np.max at
    toxic_filter.py:142-145). One groupBy on the doc id; with the explode
    above this is the explode→score→regroup pattern that replaces the
    reference's in-process overflow bookkeeping (xlmr:78-90)."""
    return chunked.groupBy(id_col).agg(F.max(score_col).alias("doc_score"))


# ---------------------------------------------------------------------------
# Misc scalar annotators
# ---------------------------------------------------------------------------


def split_score_columns(df: DataFrame, output_col: str = "output") -> DataFrame:
    """A5 — split a 'c p e d' score string into 4 int columns
    (reference code_processing.py:27-29)."""
    names = ["clarity", "practice", "educational", "difficulty"]
    return df.select(
        "*",
        *[
            F.split_part(F.col(output_col), F.lit(" "), F.lit(i + 1)).try_cast("int").alias(n)
            for i, n in enumerate(names)
        ],
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """A8 — URL metadata builders (tokenize_with_metadata.py:145-184):
    domain, path-suffix, raw url. The stochastic emission gate
    (rand(seed) < meta_data_ratio) is intentionally omitted from the
    oracle path; use `with_stochastic_gate` for reference parity."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import url_host, url_suffix

    u = F.col(url_col)
    return df.withColumn("url_domain", url_host(u)).withColumn("url_suffix", url_suffix(u))


def with_stochastic_gate(df: DataFrame, col: str, ratio: float, seed: int = 42) -> DataFrame:
    """The reference's seeded emission gate (tokenize_with_metadata.py:153):
    keep the annotation w.p. ratio else empty string. Seeded rand() is
    partition-order dependent in Spark — fine here (reference is equally
    order-dependent), but excluded from oracle checks."""
    return df.withColumn(
        col, F.when(F.rand(seed) < F.lit(ratio), F.col(col)).otherwise(F.lit(""))
    )


# ---------------------------------------------------------------------------
# Model plug-in contract (docs/model_plugins.md): every stubbed model
# operator takes an optional `*_factory` callable. The factory runs ONCE
# per executor Python worker (executor_singleton) and returns the batch
# predict function; Arrow batches stream through it. Passing a factory
# replaces the deterministic stub with the real model — no operator code
# changes, exactly the reference's per-task model-load slot
# (xlmr_embedding_annotator.py:41-46, code_classifier.py:53-68).
# ---------------------------------------------------------------------------

_PLUGIN_SINGLETONS: dict = {}


def executor_singleton(factory, cache_key: str | None = None):
    """Build-once-per-worker model cache: calls ``factory()`` the first
    time a given key is seen in this Python worker process and returns the
    cached object afterwards — across tasks AND across queries reusing the
    worker. Key defaults to the factory's qualified name; pass
    ``cache_key`` when two factories share one (e.g. closures
    parameterized differently)."""
    key = cache_key or (getattr(factory, "__module__", "?"),
                        getattr(factory, "__qualname__", repr(factory)))
    if key not in _PLUGIN_SINGLETONS:
        _PLUGIN_SINGLETONS[key] = factory()
    return _PLUGIN_SINGLETONS[key]


# ---------------------------------------------------------------------------
# A1 — document embedding annotator (reference xlmr_embedding_annotator.py:4-91):
# tokenize into chunk_len-token overflow windows, encode each chunk, attach
# array<array<float>> per doc. The default encoder is STUBBED (deterministic
# vector from the chunk digest — no encoder libs in this container); pass
# encoder_factory to plug in a real model. The Spark plumbing (Arrow
# batches, per-executor model singleton, chunk→doc regrouping at
# xlmr:78-90) is identical either way.
# ---------------------------------------------------------------------------


def _stub_encoder_factory_for(dim: int):
    def stub_encoder_factory():
        import hashlib

        def encode_batch(chunk_texts: list[str]) -> np.ndarray:
            out = np.empty((len(chunk_texts), dim), dtype=np.float32)
            for i, t in enumerate(chunk_texts):
                digest = hashlib.md5(t.encode()).digest()
                rng = np.random.default_rng(int.from_bytes(digest[:4], "little"))
                v = rng.standard_normal(dim)
                out[i] = v / np.linalg.norm(v)
            return out

        return encode_batch

    return stub_encoder_factory


def embed_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    chunk_len: int = 512, dim: int = 64, stub: bool = True,
                    encoder_factory=None, cache_key: str | None = None) -> DataFrame:
    """A1 — chunk + encode + regroup. ``encoder_factory() ->
    encode_batch(list[str]) -> (n, dim) float array``; all chunks of an
    Arrow batch go through ONE encode_batch call (the reference's manual
    batching, toxic_filter.py:123)."""
    if encoder_factory is None:
        if not stub:
            raise NotImplementedError(
                "no transformer runtime in this environment — pass "
                "encoder_factory (docs/model_plugins.md) or stub=True"
            )
        encoder_factory = _stub_encoder_factory_for(dim)
        cache_key = f"__stub_encoder_{dim}"

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, embeddings array<array<float>>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encode_batch = executor_singleton(encoder_factory, cache_key)
        for pdf in batches:
            chunk_texts: list[str] = []
            spans: list[tuple] = []  # (row id, chunk count)
            # column arrays, not iterrows (a Series per row is ~30x slower)
            for rid, text in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                words = (text or "").split()
                chunks = [
                    " ".join(words[i : i + chunk_len])
                    for i in range(0, max(len(words), 1), chunk_len)
                ]
                chunk_texts.extend(chunks)
                spans.append((rid, len(chunks)))
            vecs = np.asarray(encode_batch(chunk_texts), dtype=np.float32)
            out, pos = [], 0
            for rid, n in spans:
                out.append((rid, [vecs[pos + j].tolist() for j in range(n)]))
                pos += n
            yield pd.DataFrame(out, columns=[id_col, "embeddings"])

    return df.select(id_col, text_col).mapInPandas(run, schema)


def llm_annotate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 max_chars: int = 32_000, stub: bool = True,
                 complete_factory=None, cache_key: str | None = None) -> DataFrame:
    """A4 — LLM rubric annotation (reference code_annotation.py:33-78):
    truncate to 32k chars, prompt an LLM, get a 'c p e d' score string.
    ``complete_factory() -> complete_batch(list[str]) -> list[str]`` plugs
    in a real endpoint client (built once per worker); the default STUB
    scores deterministically from the truncated-content digest. Downstream
    parsing is split_score_columns (A5)."""
    stub_used = complete_factory is None
    if complete_factory is None:
        if not stub:
            raise NotImplementedError(
                "no LLM inference endpoint configured — pass complete_factory "
                "(docs/model_plugins.md) or stub=True"
            )

        def complete_factory():
            import hashlib

            def complete_batch(contents: list[str]) -> list[str]:
                out = []
                for content in contents:
                    h = hashlib.md5(content.encode()).digest()
                    out.append(f"{h[0] % 10} {h[1] % 10} {h[2] % 10} {h[3] % 3}")
                return out

            return complete_batch

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, output string"

    llm_key = "__stub_llm" if stub_used else cache_key

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        complete_batch = executor_singleton(complete_factory, llm_key)
        for pdf in batches:
            contents = [(t or "")[:max_chars] for t in pdf[text_col]]  # truncation :69-71
            out = pdf[[id_col]].copy()
            out["output"] = complete_batch(contents)
            yield out

    return df.select(id_col, text_col).mapInPandas(run, schema)


def fasttext_annotate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_labels: int = 2, stub: bool = True,
                      model_factory=None, cache_key: str | None = None) -> DataFrame:
    """A6 — fasttext label prediction per row (reference
    code_classifier.py:53-68; model file shipped to executors).
    ``model_factory() -> predict_batch(list[str]) -> list[int]`` plugs in
    a real model loaded from SparkFiles once per worker; the default STUB
    labels deterministically from the content digest."""
    stub_used = model_factory is None
    if model_factory is None:
        if not stub:
            raise NotImplementedError(
                "no fasttext runtime in this environment — pass model_factory "
                "(docs/model_plugins.md) or stub=True"
            )

        def model_factory():
            import hashlib

            def predict_batch(texts: list[str]) -> list[int]:
                return [
                    int(hashlib.md5((t or "").encode()).digest()[0]) % n_labels
                    for t in texts
                ]

            return predict_batch

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, label int"

    ft_key = f"__stub_fasttext_{n_labels}" if stub_used else cache_key

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        predict_batch = executor_singleton(model_factory, ft_key)
        for pdf in batches:
            out = pdf[[id_col]].copy()
            out["label"] = predict_batch(list(pdf[text_col]))
            yield out

    return df.select(id_col, text_col).mapInPandas(run, schema)


def toxic_scorer(df: DataFrame, emb_col: str = "embeddings", id_col: str = "doc_id",
                 dim: int = 64, hidden: int = 16) -> DataFrame:
    """A2 — ToxicScorer: MLP over EVERY chunk embedding of a doc, doc score
    = max over chunks (reference toxic_filter.py:92-149, np.max at
    :142-145). Input carries array<array<float>> (A1 output); chunks
    explode to rows, score via the Arrow MLP, regroup with max — the
    distributed form of the reference's in-process chunk loop."""
    chunked = df.select(F.col(id_col), F.explode(F.col(emb_col)).alias("chunk"))
    scored = chunked.withColumn("score", mlp_score_udf(dim, hidden)(F.col("chunk")))
    return scored.groupBy(id_col).agg(F.max("score").alias("toxic_score"))


def hf_classifier_annotate(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", label_name: str = "quality",
                           n_labels: int = 10, stub: bool = True,
                           pipeline_factory=None, cache_key: str | None = None) -> DataFrame:
    """A7 — HF classifier/regressor annotation → ``cb_<label>`` column
    (reference code_classifier.py:336-371 HFClassifier, 485-519
    HFRegressor: tokenize + forward + argmax on GPU executors).
    ``pipeline_factory() -> classify_batch(list[str]) -> list[int]`` plugs
    in a real transformers pipeline once per worker; the default STUB
    labels deterministically from the content digest."""
    stub_used = pipeline_factory is None
    if pipeline_factory is None:
        if not stub:
            raise NotImplementedError(
                "no transformer runtime in this environment — pass "
                "pipeline_factory (docs/model_plugins.md) or stub=True"
            )

        def pipeline_factory():
            import hashlib

            def classify_batch(texts: list[str]) -> list[int]:
                return [
                    int(hashlib.md5((t or "").encode()).digest()[4]) % n_labels
                    for t in texts
                ]

            return classify_batch

    id_type = dict(df.dtypes)[id_col]
    out_col = f"cb_{label_name}"
    schema = f"{id_col} {id_type}, {out_col} int"

    hf_key = f"__stub_hf_{n_labels}" if stub_used else cache_key

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        classify_batch = executor_singleton(pipeline_factory, hf_key)
        for pdf in batches:
            out = pdf[[id_col]].copy()
            out[out_col] = classify_batch(list(pdf[text_col]))
            yield out

    return df.select(id_col, text_col).mapInPandas(run, schema)


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Quality signal: deflate compression ratio of the document text
    (compressed/raw bytes) — the classic repetitiveness proxy
    (boilerplate and templated spam compress far below prose; the
    RefinedWeb/Gopher-family pipelines gate on it). Pure stdlib zlib, so
    it runs everywhere, but NOT SQL-expressible — the registered query
    is rows-only by necessity (no zlib in the oracle engine); local
    tests pin the closed-form cases instead.

    Arrow-batched mapInPandas; deterministic for a fixed level and
    zlib build. Empty/NULL text → NULL ratio (not 0: a 0 would sort
    empty docs as 'maximally repetitive').
    """
    import zlib
    from typing import Iterator as _It

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, raw_bytes int, ratio double"

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None or t == "":
                    out.append((i, 0 if t == "" else None, None))
                    continue
                raw = t.encode("utf-8")
                out.append((i, len(raw), len(zlib.compress(raw, level)) / len(raw)))
            yield pd.DataFrame(out, columns=[id_col, "raw_bytes", "ratio"])

    return df.select(id_col, text_col).mapInPandas(run, schema)
