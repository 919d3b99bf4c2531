from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import formatters


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        formatters.pii_scrub(F.col("text")).alias("s"),
        formatters.pii_count(F.col("text")).alias("c"),
    ).collect()[0]


def test_pii_scrub_all_families(spark):
    r = _one(spark, "mail a@b.com and a@b.com ip 10.0.0.1 iban DE89370400440532013000 end")
    assert "<email-pii>" in r.s and "<ip-pii>" in r.s and "<iban-pii>" in r.s
    assert "a@b.com" not in r.s and "10.0.0.1" not in r.s
    # unique-count semantics (pii_formatter.py:78,88-99): a@b.com twice -> 1
    assert r.c == 3


def test_pii_replaces_all_occurrences(spark):
    r = _one(spark, "x@y.org then x@y.org again")
    assert r.s.count("<email-pii>") == 2 and r.c == 1


def test_pii_clean_text_untouched(spark):
    r = _one(spark, "no pii here at all")
    assert r.s == "no pii here at all" and r.c == 0


def test_flan_template(spark):
    df = spark.createDataFrame([("q", "a")], "i string, o string")
    out = df.select(formatters.flan_template(F.col("i"), F.col("o")).alias("t")).collect()
    assert out[0].t == "User:\nq\nAssistant:\na"


def test_chat_flatten(spark):
    df = spark.createDataFrame(
        [([("user", "hi"), ("assistant", "yo")],)],
        "conversations array<struct<from:string,value:string>>",
    )
    out = df.select(formatters.chat_flatten(F.col("conversations")).alias("t")).collect()
    assert out[0].t == "user: hi\nassistant: yo"


def test_bidirectional_two_rows_per_input(spark):
    df = spark.createDataFrame([("en", "hello", "de", "hallo")], "l1 string, t1 string, l2 string, t2 string")
    out = formatters.bidirectional_pairs(
        df, F.col("l1"), F.col("t1"), F.col("l2"), F.col("t2")
    ).collect()
    texts = sorted(r.text for r in out)
    assert texts == ["de: hallo\nen: hello", "en: hello\nde: hallo"] or len(texts) == 2


def test_fasttext_line(spark):
    df = spark.createDataFrame([(1, "a\nb")], "label int, text string")
    out = df.select(formatters.fasttext_line(F.col("label"), F.col("text")).alias("l")).collect()
    assert out[0].l == "__label__1 a\\nb"


def test_pii_regex_table_priority_order(spark, tmp_path):
    csv = tmp_path / "eu.csv"
    csv.write_text(
        "Priority,Regex,Replacement\n"
        'P1,\\bB\\d{4}\\b,<b-pii>\n'
        'P0,\\bA\\d{4}\\b,<a-pii>\n'
    )
    passes = formatters.load_pii_regex_table(str(csv))
    assert passes == [("\\bA\\d{4}\\b", "<a-pii>"), ("\\bB\\d{4}\\b", "<b-pii>")]
    df = spark.createDataFrame([("id A1234 and B9999 x@y.com",)], "text string")
    out = df.select(
        formatters.pii_scrub_with_table(F.col("text"), passes).alias("s")
    ).collect()[0]
    # reference parity: the wrapped (\.|$|\,|\s) boundary is consumed by
    # re.sub, so the space after each EU match disappears with it
    assert out.s == "id <a-pii>and <b-pii><email-pii>"


def test_pii_table_runs_before_builtins(spark):
    """Reference PIIFormatter.format applies EU replacers BEFORE the
    email/ip/iban passes — an EU pattern that would also match an email
    must win."""
    csv_passes = [(r"\S+@corp\.example", "<eu-pii>")]
    df = spark.createDataFrame([("mail bob@corp.example now",)], "text string")
    out = df.select(
        formatters.pii_scrub_with_table(F.col("text"), csv_passes).alias("s")
    ).collect()[0]
    assert out.s == "mail <eu-pii>now"


def test_iban_spaced_reference_format(spark):
    """The reference's space-grouped iban_regex (pii_formatter.py:70) —
    previously unmatched by the compact-only pattern."""
    r = _one(spark, "pay DE89 3704 0044 0532 0130 00 today")
    assert "<iban-pii>" in r.s and "3704" not in r.s
    assert r.c == 1


def test_with_pii_parity_all_three_outputs(spark):
    """with_pii (the ONE shared rewritten-text chain) must agree with the
    standalone pii_scrub / pii_count / pii_list expressions on every
    output, including the optional match list."""
    texts = [
        "mail a@b.com and a@b.com ip 10.0.0.1 iban DE89370400440532013000",
        "pay DE89 3704 0044 0532 0130 00 today",
        "no pii here at all",
        "x@y.org then 192.168.0.1 then x@y.org",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    shared = {
        r.doc_id: (r.s, r.c, list(r.l))
        for r in formatters.with_pii(
            df, "text", scrub_col="s", count_col="c", list_col="l"
        ).collect()
    }
    standalone = {
        r.doc_id: (r.s, r.c, list(r.l))
        for r in df.select(
            "doc_id",
            formatters.pii_scrub(F.col("text")).alias("s"),
            formatters.pii_count(F.col("text")).alias("c"),
            formatters.pii_list(F.col("text")).alias("l"),
        ).collect()
    }
    assert shared == standalone
    assert shared[0][1] == 3 and "a@b.com" in shared[0][2]
    assert shared[2] == ("no pii here at all", 0, [])


def test_hf_classifier_annotate(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    out = {r.doc_id: r.cb_quality for r in annotators.hf_classifier_annotate(df).collect()}
    out2 = {r.doc_id: r.cb_quality for r in annotators.hf_classifier_annotate(df).collect()}
    assert out == out2 and all(0 <= v <= 9 for v in out.values())
