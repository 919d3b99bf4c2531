from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import robots

ROBOTS_A = """
User-agent: GPTBot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
"""


def test_parse_and_match():
    g = robots.parse_robots(ROBOTS_A)
    assert not robots.is_allowed(g, "GPTBot", "/anything")
    assert robots.is_allowed(g, "CCBot", "/public")
    assert not robots.is_allowed(g, "CCBot", "/private/x")
    assert robots.is_allowed(g, "CCBot", "/private/ok/x")  # longest match wins


def test_robots_filter_annotates(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/page"),
            (2, "https://a.com/private/x"),
            (3, "https://unknown.com/x"),
        ],
        "doc_id long, url string",
    )
    rob = spark.createDataFrame([("a.com", ROBOTS_A)], "domain string, content string")
    out = {r.doc_id: sorted(r.disallowed_user_agents)
           for r in robots.robots_filter(docs, rob).collect()}
    assert out[1] == ["GPTBot"]                      # GPTBot blocked everywhere
    assert "CCBot" in out[2] and len(out[2]) == 16   # /private blocks * group
    assert out[3] == []                              # no robots.txt -> allowed


def test_robots_kept_removed_split(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.com/page"), (2, "https://a.com/private/x")],
        "doc_id long, url string",
    )
    rob = spark.createDataFrame([("a.com", ROBOTS_A)], "domain string, content string")
    annotated = robots.robots_filter(docs, rob)
    kept = annotated.filter(F.size("disallowed_user_agents") == 0)
    removed = annotated.filter(F.size("disallowed_user_agents") > 0)
    assert kept.count() + removed.count() == 2


def test_robots_filter_join_matches_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.com/page"), (2, "https://a.com/private/x"), (3, "https://n.com/z")],
        "doc_id long, url string",
    )
    rob = spark.createDataFrame([("a.com", ROBOTS_A)], "domain string, content string")
    bc = {r.doc_id: sorted(r.disallowed_user_agents)
          for r in robots.robots_filter(docs, rob).collect()}
    jn = {r.doc_id: sorted(r.disallowed_user_agents)
          for r in robots.robots_filter_join(docs, rob).collect()}
    assert bc == jn
