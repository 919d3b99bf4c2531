"""RobotsTxtFilter (F2 — reference robots_filter.py:30-92).

Reference semantics: load a {domain → robots.txt content} dict from parquet
(dclm-edu/main.py:75-77), parse per-domain with a cached parser
(lru_cache(8192), robots_filter.py:43-58), and drop a document if ANY of
the AI user agents is disallowed for its url; rejected docs get
``disallowed_user_agents`` annotated (robots_filter.py:88).

Spark shape: broadcast the robots dict (domains ≪ docs), evaluate with an
Arrow-batched ``mapInPandas`` keeping a per-executor parsed-rule cache —
the lru_cache analogue, built once per worker not per row. The parser
implements the public robots.txt format per RFC 9309 with Protego-parity
semantics (user-agent groups with substring fallback, ``*``/``$`` path
wildcards, longest-match wins, Allow beats Disallow on ties) — the
container has no Protego, so the matcher is implemented here directly.

Scale: the only movement of the robots table is ONE broadcast; documents
stream through a narrow stage. Skew-free (per-row work is bounded by rule
count of one domain).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the 15 user agents the reference removes on, verbatim from
#: _DEFAULT_REMOVE_USER_AGENTS (robots_filter.py:11-27) — including the
#: ``"*"`` entry: a document is dropped when even the wildcard agent is
#: disallowed for its url.
AI_USER_AGENTS = [
    "AI2Bot",  # AI2
    "Applebot-Extended",  # Apple
    "Bytespider",  # Bytedance
    "CCBot",  # Common Crawl
    "CCBot/2.0",  # Common Crawl
    "CCBot/1.0",  # Common Crawl
    "ClaudeBot",  # Anthropic
    "cohere-training-data-crawler",  # Cohere
    "Diffbot",  # Diffbot
    "FacebookBot",  # Meta
    "Meta-ExternalAgent",  # Meta
    "Google-Extended",  # Google
    "GPTBot",  # OpenAI
    "PanguBot",  # Huawei
    "*",
]


def parse_robots(content: str) -> dict[str, list[tuple[str, bool]]]:
    """Parse robots.txt → {lower(agent): [(path_pattern, allowed), ...]}.

    Public REP format (RFC 9309, as implemented by Protego — the
    reference's parser, robots_filter.py:54): groups may list several
    User-agent lines; repeated groups for the same agent merge; an empty
    Disallow value means allow-all (no rule recorded). Path patterns may
    contain ``*`` (any char sequence) and a trailing ``$`` (end anchor) —
    matching happens in :func:`is_allowed`.
    """
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    last_was_rule = True
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if last_was_rule:
                current = []
            current.append(val.lower())
            for a in current:
                groups.setdefault(a, [])
            last_was_rule = False
        elif key in ("disallow", "allow"):
            for a in current:
                if val:
                    groups.setdefault(a, []).append((val, key == "allow"))
            last_was_rule = True
    return groups


@lru_cache(maxsize=65536)
def _compiled_rule(pattern: str) -> "re.Pattern[str] | None":
    """Compile a REP path pattern to a start-anchored regex, or None when
    the pattern is a plain prefix (fast path: str.startswith)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    if not anchored and "*" not in body and "$" not in body:
        return None
    rx = ".*".join(re.escape(piece) for piece in body.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


def _rule_matches(pattern: str, path: str) -> bool:
    rx = _compiled_rule(pattern)
    if rx is None:
        return path.startswith(pattern)
    return rx.match(path) is not None


def _agent_rules(groups: dict[str, list[tuple[str, bool]]], agent: str):
    """Protego-style group resolution: exact (case-insensitive) match
    first, else the longest group token contained in the agent string
    (so ``CCBot/2.0`` falls back to a ``CCBot`` group), else ``*``."""
    ua = agent.lower()
    exact = groups.get(ua)
    if exact is not None:
        return exact
    best, best_len = None, 0
    for token, rules in groups.items():
        if token != "*" and token in ua and len(token) > best_len:
            best, best_len = rules, len(token)
    if best is not None:
        return best
    return groups.get("*", [])


def is_allowed(groups: dict[str, list[tuple[str, bool]]], agent: str, path: str) -> bool:
    """Protego-parity REP decision (reference robots_filter.py:43-58):
    among matching rules the longest pattern wins; on a length tie Allow
    beats Disallow; no matching rule means allowed."""
    best: tuple[int, bool] | None = None
    for pattern, allow in _agent_rules(groups, agent):
        if _rule_matches(pattern, path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def compile_agent_rules(groups: dict[str, list[tuple[str, bool]]],
                        agents: list[str]):
    """Resolve and compile each checked agent's rule list ONCE per parsed
    robots.txt — the per-row hot loop then runs pure prefix/regex matches
    with no group resolution or pattern compilation. Cached alongside the
    parse in the executors' lru_cache, this makes per-row cost
    O(agents × rules-of-their-group), the same as the reference's cached
    Protego parser."""
    compiled = []
    for a in agents:
        rules = [(len(p), allow, _compiled_rule(p), p)
                 for p, allow in _agent_rules(groups, a)]
        compiled.append((a, rules))
    return compiled


def _denied_agents(compiled, path: str) -> list[str]:
    denied = []
    for agent, rules in compiled:
        best: tuple[int, bool] | None = None
        for ln, allow, rx, pat in rules:
            if (path.startswith(pat) if rx is None else rx.match(path) is not None):
                key = (ln, allow)
                if best is None or key > best:
                    best = key
        if best is not None and not best[1]:
            denied.append(agent)
    return denied


def robots_filter(docs: DataFrame, robots: DataFrame, url_col: str = "url",
                  agents: list[str] | None = None) -> DataFrame:
    """Annotate ``disallowed_user_agents`` (array<string>, empty = keep).

    ``robots``: (domain string, content string). Callers split kept/removed
    on ``size(disallowed_user_agents) == 0`` via the pipeline composer so
    the rejected branch carries the annotation (robots_filter.py:88).
    """
    agents = agents or AI_USER_AGENTS
    spark = docs.sparkSession
    robots_map = {r["domain"]: r["content"] for r in robots.collect()}
    # Domains that can possibly deny: non-empty name AND non-empty content
    # (the parser treats empty content as no-entry). Everything else skips
    # the Python stage entirely via the JVM pre-filter below.
    domains = [d for d, c in robots_map.items() if d and c]
    empty_arr = F.array().cast("array<string>")
    if not domains:
        return docs.withColumn("disallowed_user_agents", empty_arr)
    bc = spark.sparkContext.broadcast(robots_map)

    from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import HOST_REGEX, PATH_REGEX

    with_parts = docs.withColumn("__host", F.regexp_extract(F.col(url_col), HOST_REGEX, 1)) \
                     .withColumn("__path", F.regexp_extract(F.col(url_col), PATH_REGEX, 1))

    out_fields = ", ".join(f"{name} {dtype}" for name, dtype in with_parts.dtypes
                           if not name.startswith("__"))
    schema = out_fields + ", disallowed_user_agents array<string>"
    keep_cols = [name for name, _ in with_parts.dtypes if not name.startswith("__")]

    # JVM fast path: a host with no robots entry cannot be denied — route it
    # around the Python stage. At corpus scale most docs have no robots
    # entry, so the Arrow round-trip only touches the subset that can
    # actually match. Small domain sets become an InSet membership test
    # (Catalyst compiles the literal list to a hash-set probe); large sets
    # must NOT be embedded as plan literals (every task binary would carry
    # them, and py4j ships the list element-by-element) — they pre-filter
    # via broadcast semi/anti joins against the domains as a DataFrame,
    # the same broadcast the matcher already pays for the dict.
    # null/absent hosts are misses either way.
    if len(domains) <= 4096:
        hit = F.coalesce(F.col("__host").isin(domains), F.lit(False))
        misses = (with_parts.filter(~hit).select(*keep_cols)
                  .withColumn("disallowed_user_agents", empty_arr))
        with_parts = with_parts.filter(hit)
    else:
        dom_df = F.broadcast(
            spark.createDataFrame([(d,) for d in domains], "__host string")
        )
        misses = (with_parts.join(dom_df, "__host", "left_anti").select(*keep_cols)
                  .withColumn("disallowed_user_agents", empty_arr))
        with_parts = with_parts.join(dom_df, "__host", "left_semi")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value

        @lru_cache(maxsize=8192)  # per-executor parser cache (robots_filter.py:43)
        def parsed(domain: str):
            content = table.get(domain)
            if not content:
                return None
            return compile_agent_rules(parse_robots(content), agents)

        for pdf in batches:
            denied = []
            for host, path in zip(pdf["__host"], pdf["__path"]):
                compiled = parsed(host) if host else None
                if compiled is None:
                    denied.append([])
                    continue
                denied.append(_denied_agents(compiled, path or "/"))
            out = pdf[keep_cols].copy()
            out["disallowed_user_agents"] = denied
            yield out

    return with_parts.mapInPandas(run, schema).unionByName(misses)


def robots_filter_join(docs: DataFrame, robots: DataFrame, url_col: str = "url",
                       agents: list[str] | None = None) -> DataFrame:
    """F2 at robots-table scale: when the {domain → robots.txt} table is
    too large to broadcast (robots_filter uses driver collect + broadcast),
    LEFT JOIN the content onto the documents by host — one shuffle keyed by
    host — and parse per row with the same per-executor cache. Same output
    contract as robots_filter."""
    agents = agents or AI_USER_AGENTS

    from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import HOST_REGEX, PATH_REGEX

    with_parts = docs.withColumn("__host", F.regexp_extract(F.col(url_col), HOST_REGEX, 1)) \
                     .withColumn("__path", F.regexp_extract(F.col(url_col), PATH_REGEX, 1))
    joined = with_parts.join(
        robots.select(F.col("domain").alias("__host"), F.col("content").alias("__robots"))
        .dropDuplicates(["__host"]),  # duplicate domains must not multiply docs
        "__host", "left",
    )

    keep_cols = [n for n, _ in docs.dtypes]
    out_fields = ", ".join(f"{n} {t}" for n, t in docs.dtypes)
    schema = out_fields + ", disallowed_user_agents array<string>"

    # Same fast path as robots_filter, join-shaped: the left join already
    # materialized hit-or-miss as __robots nullability, so misses bypass
    # the Python stage without any extra probe.
    misses = (joined.filter(F.col("__robots").isNull()).select(*keep_cols)
              .withColumn("disallowed_user_agents", F.array().cast("array<string>")))
    hits = joined.filter(F.col("__robots").isNotNull())

    def run(batches):
        from functools import lru_cache

        @lru_cache(maxsize=8192)
        def parsed(content: str):
            return compile_agent_rules(parse_robots(content), agents)

        for pdf in batches:
            denied = []
            for content, path in zip(pdf["__robots"], pdf["__path"]):
                if content is None:
                    denied.append([])
                    continue
                denied.append(_denied_agents(parsed(content), path or "/"))
            out = pdf[keep_cols].copy()
            out["disallowed_user_agents"] = denied
            yield out

    return hits.mapInPandas(run, schema).unionByName(misses)
