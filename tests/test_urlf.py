"""URL canonicalization (functions/urlf.canonical_url)."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import canonical_url


def _canon(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]


def test_canonical_url_case_www_port_fragment_slash(spark):
    variants = [
        "HTTPS://WWW.Example.COM:443/A/b/",
        "https://example.com/A/b",
        "https://example.com:443/A/b#section",
    ]
    got = _canon(spark, *variants)
    assert set(got) == {"https://example.com/A/b"}  # path case PRESERVED


def test_canonical_url_tracking_params(spark):
    got = _canon(
        spark,
        "https://a.com/p?utm_source=x&id=7&utm_medium=y",
        "https://a.com/p?id=7",
        "https://a.com/p?utm_source=x",          # tracking-only -> no '?'
        "https://a.com/p?gclid=1&fbclid=2",
        "http://b.com:80/q?x=1&y=2",
    )
    assert got[0] == got[1] == "https://a.com/p?id=7"
    assert got[2] == got[3] == "https://a.com/p"
    assert got[4] == "http://b.com/q?x=1&y=2"     # param order preserved


def test_canonical_url_distinct_pages_stay_distinct(spark):
    got = _canon(
        spark,
        "https://a.com/p?id=7",
        "http://a.com/p?id=7",      # scheme differs
        "https://a.com:8080/p?id=7",  # non-default port kept
        "https://a.com/p?id=8",
    )
    assert len(set(got)) == 4


def test_canonical_url_scheme_specific_default_ports(spark):
    got = _canon(
        spark,
        "https://a.com:80/p",    # 80 is NOT https's default port -> kept
        "http://a.com:443/p",    # 443 is NOT http's default port -> kept
        "https://a.com/p",
        "http://a.com/p",
    )
    assert len(set(got)) == 4
    assert got[0] == "https://a.com:80/p"
    assert got[1] == "http://a.com:443/p"


def test_canonical_url_malformed_passthrough(spark):
    # unparseable URLs keep their OWN key — not the shared '://' collapse
    got = _canon(spark, "page.html?id=7", "not a url", "ftp:/missing-slash")
    assert got == ["page.html?id=7", "not a url", "ftp:/missing-slash"]
