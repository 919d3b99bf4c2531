"""Luhn-gated credit-card PII pass."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators.formatters import (
    CC_TAG,
    _luhn_ok,
    cc_candidates,
    cc_pii_scrub,
)


def _scrub_one(spark, t):
    df = spark.createDataFrame([(t,)], "t string")
    return df.select(cc_pii_scrub(F.col("t")).alias("s")).head().s


def test_valid_cards_masked_invalid_kept(spark):
    assert _scrub_one(spark, "pay 4539 1488 0343 6467 now") == f"pay {CC_TAG} now"
    assert _scrub_one(spark, "ref 4539 1488 0343 6468 no") == "ref 4539 1488 0343 6468 no"
    # amex (15 digits, compact) and dashed grouping both validate
    assert _scrub_one(spark, "amex 378282246310005 x") == f"amex {CC_TAG} x"
    assert _scrub_one(spark, "d 4539-1488-0343-6467 e") == f"d {CC_TAG} e"


def test_short_and_long_runs_not_candidates(spark):
    assert _scrub_one(spark, "zip 123456789012 a") == "zip 123456789012 a"  # 12 digits
    assert _scrub_one(spark, "plain words only") == "plain words only"


def test_multiple_and_repeated_candidates(spark):
    t = "a 4539 1488 0343 6467 b 378282246310005 c 4539 1488 0343 6467 d"
    assert _scrub_one(spark, t) == f"a {CC_TAG} b {CC_TAG} c {CC_TAG} d"


def test_luhn_matches_reference_impl(spark):
    def luhn(s):
        ds = [int(c) for c in s if c.isdigit()]
        tot = sum(d if r % 2 == 0 else (d * 2 - 9 if d * 2 > 9 else d * 2)
                  for r, d in enumerate(reversed(ds)))
        return tot % 10 == 0

    cands = ["4539148803436467", "4539148803436468", "378282246310005",
             "6011111111111117", "6011111111111118", "30569309025904"]
    df = spark.createDataFrame([(c,) for c in cands], "c string")
    got = {r.c: r.v for r in df.select("c", _luhn_ok(F.col("c")).alias("v")).collect()}
    assert got == {c: luhn(c) for c in cands}


def test_candidates_extraction(spark):
    df = spark.createDataFrame([("x 4539 1488 0343 6467 y 12345 z",)], "t string")
    arr = df.select(cc_candidates(F.col("t")).alias("a")).head().a
    assert arr == ["4539 1488 0343 6467"]


def test_embedded_occurrence_in_longer_run_untouched(spark):
    """ADVICE r10: a valid card string that ALSO appears as a substring
    of a longer digit run (a 23-digit serial) must be masked only where
    it was a \\b-bounded candidate — a literal replace corrupted the
    serial too."""
    t = "card 4539148803436467 serial 45391488034364671234567 end"
    got = _scrub_one(spark, t)
    assert got == f"card {CC_TAG} serial 45391488034364671234567 end"
    # and when ONLY the embedded form exists, nothing is a candidate
    t2 = "serial 45391488034364671234567 only"
    assert _scrub_one(spark, t2) == t2


def test_embedded_occurrence_in_separated_run_untouched(spark):
    """ADVICE r11: a valid card embedded in a longer SEPARATOR-delimited
    run ('123 4539 1488 0343 6467' — 19 digits, one non-candidate to the
    greedy scan) has a word boundary at the group edge, so the old
    \\b-only anchors still rewrote it when the same card was a genuine
    candidate elsewhere in the doc. The lookarounds forbid an adjacent
    separator+digit on either side."""
    # the 19-digit runs 123+card / card+124 are Luhn-INVALID whole
    # (a Luhn-valid 19-digit run WOULD be a legitimate card and mask)
    t = ("card 4539 1488 0343 6467 ok; serial 123 4539 1488 0343 6467 "
         "stays; tail 4539 1488 0343 6467 124 stays too")
    got = _scrub_one(spark, t)
    assert got == (f"card {CC_TAG} ok; serial 123 4539 1488 0343 6467 "
                   "stays; tail 4539 1488 0343 6467 124 stays too")
    # only embedded forms present -> no candidate, nothing rewritten
    t2 = "just 123 4539 1488 0343 6467 here"
    assert _scrub_one(spark, t2) == t2
