"""Corpus-level term statistics: TF-IDF, inverted index, distribution
drift.

The reference pipeline's quality/threshold stages consume per-doc scalar
scores; these operators add the corpus-global term view a data-curation
team needs next to them — which terms characterize a document against
the whole corpus (TF-IDF), where a term occurs (inverted index), and how
far one slice's unigram distribution has drifted from another's (KL) —
e.g. a new crawl snapshot against the previous one, or one source
against the corpus mix.

All three are pure DataFrame aggregations: one explode of the token
stream, then hash-partitioned groupBys with map-side combine. No text
ever shuffles — after tokenization only (term, id, count) tuples move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.text import tokens_ws


def term_frequencies(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf) — one row per distinct term per doc. The explode
    happens once; partial aggregation collapses repeats map-side before
    the (id, term) shuffle."""
    return (
        df.select(F.col(id_col), F.explode(tokens_ws(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf, df_t, tfidf) with smooth idf
    ``ln((N+1)/(df_t+1)) + 1`` (scikit-style smoothing: never divides by
    zero, unseen-term idf stays finite).

    Two aggregations over the same exploded stream: per-(doc, term)
    counts, then per-term doc frequencies joined back ON TERM — not
    force-broadcast: a clean corpus has a modest vocabulary, but a
    100 TB web crawl's token set (typos, URLs, ids) is itself huge, and
    AQE should pick broadcast only when the vocab actually fits (both
    sides already hash-partition by term from their aggregations, so
    the fallback join is co-partitioned). N arrives as a 1-row
    cross-broadcast, never a driver-side collect.
    """
    tf = term_frequencies(df, id_col, text_col)
    doc_freq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(doc_freq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df_t") + 1)) + 1),
        )
        .drop("n_docs")
    )


def top_terms(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              k: int = 3) -> DataFrame:
    """Top-k characteristic terms per doc by TF-IDF, ties broken by term
    so ranks are deterministic (exact score ties have identical (tf, df)
    and therefore bit-identical doubles)."""
    scored = tf_idf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df_t", "tfidf")
    )


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_postings: int | None = None) -> DataFrame:
    """(term, df_t, postings) — sorted doc-id postings list per term.

    The ARRAY form is for bounded vocabularies / post-filter use: a
    stopword's postings at 100 TB is billions of ids and must NOT be
    materialized into one row. ``max_postings`` caps that — terms above
    the cap keep their df_t but carry an EMPTY postings array (the
    exploded (term, id) pair table, partitioned by term, is the at-scale
    representation; this operator is its compacted head).
    """
    pairs = (
        df.select(F.col(id_col), F.explode(tokens_ws(F.col(text_col))).alias("term"))
        .distinct()
    )
    agg = pairs.groupBy("term").agg(
        F.count("*").alias("df_t"),
        F.sort_array(F.collect_list(id_col)).alias("postings"),
    )
    if max_postings is not None:
        agg = agg.withColumn(
            "postings",
            F.when(F.col("df_t") <= max_postings, F.col("postings"))
            .otherwise(F.array().cast(agg.schema["postings"].dataType)),
        )
    return agg


def term_distribution_drift(df: DataFrame, slice_col: Column,
                            text_col: str = "text") -> DataFrame:
    """Per-term unigram-distribution drift between the TWO slices named by
    ``slice_col`` ('p' rows vs 'q' rows): emits (term, p, q, kl_term)
    with add-one smoothing over the UNION vocabulary, where
    ``kl_term = p * ln(p / q)``; ``sum(kl_term)`` is KL(P || Q) — the
    snapshot-over-snapshot drift monitor.

    One token explode, one (slice, term) count, one vocab-sized pivot —
    the corpus never moves twice.
    """
    counts = (
        df.select(slice_col.alias("slice"),
                  F.explode(tokens_ws(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("slice") == "p", 1).otherwise(0)).alias("np"),
            F.sum(F.when(F.col("slice") == "q", 1).otherwise(0)).alias("nq"),
        )
    )
    totals = counts.agg(
        F.sum("np").alias("tp"), F.sum("nq").alias("tq"),
        F.count("*").alias("vocab"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "term",
            ((F.col("np") + 1) / (F.col("tp") + F.col("vocab"))).alias("p"),
            ((F.col("nq") + 1) / (F.col("tq") + F.col("vocab"))).alias("q"),
        )
        .withColumn("kl_term", F.col("p") * F.log(F.col("p") / F.col("q")))
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 retrieval: score every document against a bag-of-words
    query, return the top-k as (id, score, rank).

    ``idf = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))`` (the Lucene
    formulation — non-negative even for terms in more than half the
    corpus) and ``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl))`` over the query terms a doc contains.

    Shape at 100 TB: the term filter is a literal InSet applied to the
    exploded token stream BEFORE any aggregation, so only query-term
    postings ever shuffle — the corpus-sized token stream dies in the
    scan stage. Doc length rides the explode as a projected column
    (``size()`` of the token array, no second scan and no corpus-keyed
    join); (N, avgdl) is a one-row broadcast; per-term df is a
    ≤|query|-row broadcast; the final top-k is TakeOrderedAndProject
    (per-partition partial top-k, single merge — no global sort).

    Ordering ranks on the score ROUNDED to 9dp, tie-broken by id: the
    per-doc sum over query terms accumulates in nondeterministic order,
    so two docs with identical (tf vector, dl) can differ in the last
    ulp run-to-run — ranking on the rounded value keeps rank order and
    top-k membership deterministic (and engine-portable) while the
    emitted score stays unrounded (the q10 rule: value canon absorbs
    accumulation-order noise, a rounding grid in the OUTPUT could flip
    on a .5 boundary).
    """
    toks = df.select(F.col(id_col).alias("id"),
                     tokens_ws(F.col(text_col)).alias("__toks"))
    exploded = toks.select(
        "id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term"))
    pairs = (
        exploded.filter(F.col("term").isin(list(query_terms)))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    stats = toks.agg(F.count("*").alias("n_docs"),
                     F.avg(F.size("__toks")).alias("avgdl"))
    # df_t as a window count over the already-tiny postings relation: a
    # groupBy+join formulation forks `pairs` and Spark recomputes the
    # whole corpus explode for the second consumer — a third full scan
    # at 100 TB. The window costs one extra exchange of (id, term, tf)
    # tuples instead.
    df_t = F.count("*").over(Window.partitionBy("term"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    scored = (
        pairs.withColumn("df_t", df_t)
        .join(F.broadcast(stats))
        .groupBy("id")
        .agg(F.sum(idf * tf_norm).alias("score"))
    )
    score_r = F.round(F.col("score"), 9)
    w = Window.orderBy(score_r.desc(), F.asc("id"))
    return (
        scored.orderBy(score_r.desc(), F.asc("id")).limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(F.col("id").alias(id_col), "score", "rank")
    )
