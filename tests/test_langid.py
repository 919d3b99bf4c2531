"""Character-n-gram (Cavnar-Trenkle) language ID — functions/langid.py."""

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.langid import (
    LANG_SAMPLES,
    langid_ngram,
    trigram_profile,
    trigrams,
)


def test_each_sample_classifies_as_itself(spark):
    """The acceptance bar for the method: every reference paragraph,
    run through the classifier as a document, must pick its own
    language (self-distance is minimal by construction — the doc
    profile IS the language profile, so every rank displacement is 0)."""
    df = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s)
         in enumerate(sorted(LANG_SAMPLES.items()))],
        "id long, truth string, text string")
    got = langid_ngram(df, "id", "text").collect()
    truth = {i: lang for i, (lang, _)
             in enumerate(sorted(LANG_SAMPLES.items()))}
    assert len(got) == len(LANG_SAMPLES)
    for r in got:
        assert r.lang == truth[r.id], (r.id, r.lang)
        assert r.dist == 0  # identical profile: zero displacement


def test_partial_windows_still_classify(spark):
    """200-char windows (the q_langid_ngram fixture shape) must still
    land on the right language — partial profiles hit the absent-gram
    penalty path (dist > 0) without flipping the winner."""
    rows = [(i, lang, s[40:240]) for i, (lang, s)
            in enumerate(sorted(LANG_SAMPLES.items()))]
    df = spark.createDataFrame(rows, "id long, truth string, text string")
    got = {r.id: (r.lang, r.dist)
           for r in langid_ngram(df, "id", "text").collect()}
    for i, (lang, _) in enumerate(sorted(LANG_SAMPLES.items())):
        assert got[i][0] == lang, (i, got[i])
        assert got[i][1] > 0


def test_degenerate_docs_drop_identically(spark):
    """Empty / whitespace / letterless / NULL texts produce no
    trigrams and therefore NO output row — and Spark's
    sequence(1, 0) descending-step junk (substr grams shorter than 3)
    must be filtered, matching DuckDB's empty generate_series. A
    two-letter text is NOT degenerate: the boundary pad makes ' ab'
    and 'ab ' real trigrams (in both engines), so it classifies."""
    rows = [(1, ""), (2, "   "), (3, "12 34 !!"), (4, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    assert langid_ngram(df, "id", "text").count() == 0
    two = spark.createDataFrame([(1, "ab")], "id long, text string")
    assert langid_ngram(two, "id", "text").count() == 1
    # the trigram builder itself: nothing shorter than 3 survives
    grams = df.select(F.explode(trigrams(F.col("text"))).alias("g")) \
        .collect()
    assert all(len(r.g) == 3 for r in grams)


def test_profile_rank_tiebreak_deterministic(spark):
    """Equal-count trigrams rank by (count DESC, trigram ASC) — the
    total order both engines replay. 'abcabd': 'abc' and 'abd' tie at
    1; 'abc' < 'abd' so it takes the earlier rank."""
    df = spark.createDataFrame([(1, "abcabd")], "id long, text string")
    prof = {r.tri: r.rank
            for r in trigram_profile(df, "id", "text", k=64).collect()}
    assert prof["abc"] < prof["abd"]
    # padded form ' abcabd ': every substring window counted
    assert " ab" in prof and "bd " in prof


def test_winner_tiebreak_prefers_smaller_code(spark):
    """Two languages at the same distance break to the smaller code —
    pin it with a doc whose profile is disjoint from EVERY language
    profile (all penalties, same dist everywhere): winner must be the
    lexicographically first code."""
    df = spark.createDataFrame(
        [(1, "zzz qqq zzz qqq zqz qzq")], "id long, text string")
    got = langid_ngram(df, "id", "text").collect()
    assert len(got) == 1
    assert got[0].lang == sorted(LANG_SAMPLES)[0]


def test_trigram_parity_with_duckdb(spark):
    """The gram builder must agree with the oracle's generate_series
    spelling on ordinary AND degenerate inputs (the r12 find: Spark's
    sequence(1, 0) infers a negative step where DuckDB yields empty)."""
    duckdb = pytest.importorskip("duckdb")
    texts = ["Hello, World!", "a", "", "the cat", "Ab1 cd-ef"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    spark_grams = {
        r.id: sorted(r.g) for r in df.select(
            "id", trigrams(F.col("text")).alias("g")).collect()}
    for i, t in enumerate(texts):
        duck = duckdb.sql(
            "SELECT list_sort(list_filter(list_transform(generate_series("
            "1, greatest(strlen(pt) - 2, 0)), i -> substr(pt, i, 3)), "
            "g -> strlen(g) = 3)) FROM (SELECT ' ' || trim("
            "regexp_replace(lower(?), '[^a-z]+', ' ', 'g')) || ' ' AS pt)",
            params=[t]).fetchone()[0]
        assert spark_grams[i] == sorted(duck), t


def test_lang_stopword_table_topn_and_ties(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.functions.langid import (
        lang_stopword_table,
    )

    rows = lang_stopword_table(spark, n=8).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.word)
    assert set(by_lang) == set(LANG_SAMPLES)
    assert all(len(v) == 8 for v in by_lang.values())
    # the obvious function words surface
    assert "the" in by_lang["en"] and "and" in by_lang["en"]
    assert "der" in by_lang["de"] or "die" in by_lang["de"]
    assert "les" in by_lang["fr"] or "le" in by_lang["fr"]


def test_lang_routed_keep_hand_checked(spark):
    """A fluent en doc keeps; a stopword-free doc (numbers/rare words)
    drops on stop_hits; an over-long doc drops on n_words."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.langid import (
        lang_routed_keep,
    )

    fluent = ("the children walk to the school and they want to learn "
              "about the world")
    no_stop = "zebra quartz jigsaw vortex plasma nexus oryx fjord " * 2
    long_doc = "the sun and the light of the morning " * 20
    df = spark.createDataFrame(
        [(1, fluent), (2, no_stop), (3, long_doc)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           lang_routed_keep(df, min_words=5).collect()}
    assert got[1].lang == "en" and bool(got[1].keep) is True
    assert got[1].stop_hits >= 2
    assert bool(got[2].keep) is False and got[2].stop_hits < 2
    assert bool(got[3].keep) is False and got[3].n_words > 80
    assert got[3].stop_hits >= 2  # dropped by length, not stopwords


def test_lang_routed_counts_are_occurrences(spark):
    """stop_hits counts token OCCURRENCES in the predicted language's
    list, not distinct members — 'the the the' is 3 hits."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.langid import (
        lang_routed_keep,
    )

    df = spark.createDataFrame(
        [(1, "the the the school children morning")],
        "doc_id long, text string")
    r = lang_routed_keep(df, min_words=1).collect()[0]
    assert r.lang == "en"
    assert r.stop_hits == 3
    assert r.n_words == 6
