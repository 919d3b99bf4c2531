"""Encoding-damage detection + fail-closed repair."""

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
    MOJIBAKE_REGEX,
    MOJIBAKE_SIGNATURES,
    fix_mojibake_str,
    fix_mojibake_udf,
    mojibake_count,
)


def test_signatures_generated_and_printable():
    assert len(MOJIBAKE_SIGNATURES) >= 20
    # every signature is >= 2 chars and starts with a cp1252 lead form
    assert all(len(s) >= 2 for s in MOJIBAKE_SIGNATURES)
    # U+201D's UTF-8 tail byte 0x9D is unmapped in cp1252 — must be absent
    assert "”".encode("utf-8")[-1:] == b"\x9d"
    assert all("\x9d" not in s for s in MOJIBAKE_SIGNATURES)


def test_fix_mojibake_str_cases():
    clean = "café — naïve «ok» …’“"
    moji = clean.encode("utf-8").decode("cp1252")
    assert fix_mojibake_str(moji) == clean
    # fail-closed: clean accented text is NOT valid UTF-8 after re-encode
    assert fix_mojibake_str(clean) == clean
    assert fix_mojibake_str("plain ascii 42") == "plain ascii 42"
    assert fix_mojibake_str("") == ""
    assert fix_mojibake_str(None) is None
    # chars outside both codecs fail closed too
    assert fix_mojibake_str("汉字 ok") == "汉字 ok"


def test_fix_mojibake_mixed_documents_repair_per_segment():
    """ADVICE r10: a document mixing mojibake with even one clean
    non-ASCII char fails the whole-string transcode; the per-segment
    sequence-table fallback must repair the flagged spans and leave the
    clean chars untouched — mixed docs are the COMMON case on crawls."""
    moji = "café — ok".encode("utf-8").decode("cp1252")  # 'cafÃ© â€” ok'
    # clean é beside the damage
    assert fix_mojibake_str(f"résumé and {moji}") == "résumé and café — ok"
    # clean CJK beside the damage
    assert fix_mojibake_str(f"漢字 {moji}") == "漢字 café — ok"
    # clean emoji beside the damage (outside cp1252 AND latin-1)
    assert fix_mojibake_str(f"ok 🙂 {moji}") == "ok 🙂 café — ok"
    # repaired text re-scans to zero signatures: detector and repair
    # can no longer disagree
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
        MOJIBAKE_SIGNATURES,
    )
    fixed = fix_mojibake_str(f"漢字 {moji}")
    assert not any(s in fixed for s in MOJIBAKE_SIGNATURES)


def test_detection_count_hand_computed(spark):
    moji = "café — naïve".encode("utf-8").decode("cp1252")
    df = spark.createDataFrame(
        [(1, f"x {moji} y"), (2, "clean ascii"), (3, "clean café")],
        "id long, t string")
    rows = {r.id: r.n for r in
            df.select("id", mojibake_count(F.col("t")).alias("n")).collect()}
    assert rows[1] == 3  # Ã©, â€<”>, Ã¯
    assert rows[2] == 0
    assert rows[3] == 0  # clean accents are not signatures


def test_detection_engine_parity():
    duckdb = pytest.importorskip("duckdb")
    moji = "é — ï « » … ’".encode("utf-8").decode("cp1252")
    n = duckdb.sql(
        "SELECT len(regexp_extract_all(?, ?))", params=[moji, MOJIBAKE_REGEX]
    ).fetchone()[0]
    assert n == 7


def test_repair_udf_case_selects_correctly(spark):
    """The CASE-wrapped UDF form is VALUE-correct (the CASE selects the
    right branch) — but it does NOT gate the Arrow cost; that is
    test_repair_mojibake_gate_is_real's split-union form."""
    moji = "naïve".encode("utf-8").decode("cp1252")
    df = spark.createDataFrame(
        [(1, f"bad {moji}"), (2, "good café")], "id long, t string")
    fix = fix_mojibake_udf()
    out = {r.id: r.f for r in df.select(
        "id",
        F.when(mojibake_count(F.col("t")) > 0, fix(F.col("t")))
         .otherwise(F.col("t")).alias("f")).collect()}
    assert out[1] == "bad naïve"
    assert out[2] == "good café"


def test_repair_mojibake_gate_is_real(spark):
    """The split-union gate must keep the Python stage on the damaged
    branch ONLY — the old CASE-wrapped UDF was pulled into an
    unconditional ArrowEvalPython over every row (r11 review finding,
    plan-verified). One ArrowEvalPython node, under a Filter, inside a
    Union with a pure-JVM clean branch."""
    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
        repair_mojibake,
    )

    df = spark.createDataFrame(
        [(1, "plain"), (2, "cafÃ© â€” ok"), (3, "also plain"),
         (4, None)],  # NULL text: mojibake_count(NULL) is NULL — a bare
        # >0 / ~(>0) filter pair drops the row from BOTH branches
        # (ADVICE r11); the coalesced predicate keeps it on the clean
        # branch with NULL output, like the old CASE form did.
        "doc_id long, t string")
    out = repair_mojibake(df, "t", "t_fixed")
    got = {r.doc_id: r.t_fixed for r in out.collect()}
    assert got == {1: "plain", 2: "café — ok", 3: "also plain", 4: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Union" in plan
