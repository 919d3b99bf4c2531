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
    assert "CCBot" in out[2] and len(out[2]) == 15   # /private blocks * group
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


def _final_plan(df) -> str:
    # under AQE toString() appends the "== Initial Plan ==" section, which
    # would double-count operators
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_robots_prefilter_plan_and_nulls(spark):
    # Hosts with no robots entry (and null urls) must bypass the Python
    # stage JVM-side yet still appear in the output with an empty array.
    docs = spark.createDataFrame(
        [(1, "https://a.com/private/x"), (2, "https://nope.com/x"), (3, None)],
        "doc_id long, url string",
    )
    rob = spark.createDataFrame([("a.com", ROBOTS_A)], "domain string, content string")
    annotated = robots.robots_filter(docs, rob)
    out = {r.doc_id: list(r.disallowed_user_agents) for r in annotated.collect()}
    assert len(out) == 3 and out[2] == [] and out[3] == []
    assert len(out[1]) == 15
    plan = _final_plan(annotated)
    # exactly one Python stage, fed by the membership pre-filter, unioned
    # with the JVM-only miss branch
    assert plan.count("MapInPandas") == 1
    assert "Union" in plan
    # the membership pre-filter sits under the Python stage (with a single
    # domain Catalyst folds isin into an equality on the extracted host)
    assert "Filter" in plan and "a.com" in plan


def test_robots_empty_table_short_circuits(spark):
    docs = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    rob = spark.createDataFrame([], "domain string, content string")
    annotated = robots.robots_filter(docs, rob)
    assert annotated.collect()[0].disallowed_user_agents == []
    assert "MapInPandas" not in _final_plan(annotated)


def test_robots_join_prefilter_misses_bypass_python(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.com/private/x"), (2, "https://nope.com/x")],
        "doc_id long, url string",
    )
    rob = spark.createDataFrame([("a.com", ROBOTS_A)], "domain string, content string")
    annotated = robots.robots_filter_join(docs, rob)
    out = {r.doc_id: list(r.disallowed_user_agents) for r in annotated.collect()}
    assert out[2] == [] and len(out[1]) == 15
    plan = _final_plan(annotated)
    assert plan.count("MapInPandas") == 1 and "Union" in plan


def test_ua_list_matches_reference():
    # Verbatim _DEFAULT_REMOVE_USER_AGENTS (reference robots_filter.py:11-27),
    # including the "*" entry.
    assert robots.AI_USER_AGENTS == [
        "AI2Bot", "Applebot-Extended", "Bytespider", "CCBot", "CCBot/2.0",
        "CCBot/1.0", "ClaudeBot", "cohere-training-data-crawler", "Diffbot",
        "FacebookBot", "Meta-ExternalAgent", "Google-Extended", "GPTBot",
        "PanguBot", "*",
    ]


def test_wildcard_star_agent_drops_doc(spark):
    # Reference semantics: a doc is removed when even the wildcard agent is
    # disallowed — "*" is a checked agent, not just a fallback group.
    content = "User-agent: *\nDisallow: /\n"
    docs = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    rob = spark.createDataFrame([("a.com", content)], "domain string, content string")
    out = robots.robots_filter(docs, rob).collect()[0]
    assert "*" in out.disallowed_user_agents
    assert len(out.disallowed_user_agents) == 15  # every agent falls to * group


def test_path_wildcards_protego_parity():
    g = robots.parse_robots("User-agent: *\nDisallow: /*/private\n")
    assert not robots.is_allowed(g, "CCBot", "/a/private")
    assert not robots.is_allowed(g, "CCBot", "/a/b/private/x")
    assert robots.is_allowed(g, "CCBot", "/private")  # needs a segment before

    g = robots.parse_robots("User-agent: *\nDisallow: /x$\n")
    assert not robots.is_allowed(g, "CCBot", "/x")
    assert robots.is_allowed(g, "CCBot", "/x/y")  # $ anchors the end

    g = robots.parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
    assert not robots.is_allowed(g, "CCBot", "/docs/a.pdf")
    assert robots.is_allowed(g, "CCBot", "/docs/a.pdf.html")


def test_tie_allow_wins_and_longest_pattern():
    # Equal-length Allow/Disallow: Allow wins (RFC 9309 / Protego).
    g = robots.parse_robots("User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert robots.is_allowed(g, "CCBot", "/dir/x")
    # Longer pattern wins regardless of order.
    g = robots.parse_robots("User-agent: *\nAllow: /dir/open\nDisallow: /dir\n")
    assert robots.is_allowed(g, "CCBot", "/dir/open/f")
    assert not robots.is_allowed(g, "CCBot", "/dir/shut")


def test_versioned_agent_falls_back_to_product_group():
    # Protego group resolution: "CCBot/2.0" with no exact group matches the
    # longest group token contained in the agent string ("ccbot").
    g = robots.parse_robots("User-agent: CCBot\nDisallow: /\n")
    assert not robots.is_allowed(g, "CCBot/2.0", "/x")
    g2 = robots.parse_robots("User-agent: CCBot/2.0\nDisallow: /\nUser-agent: CCBot\nDisallow: /ok\n")
    assert not robots.is_allowed(g2, "CCBot/2.0", "/anything")  # exact wins
    assert robots.is_allowed(g2, "CCBot", "/anything")
