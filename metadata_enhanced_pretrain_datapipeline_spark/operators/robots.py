"""RobotsTxtFilter (F2 — reference robots_filter.py:30-92).

Reference semantics: load a {domain → robots.txt content} dict from parquet
(dclm-edu/main.py:75-77), parse per-domain with a cached parser
(lru_cache(8192), robots_filter.py:43-58), and drop a document if ANY of
the AI user agents is disallowed for its url; rejected docs get
``disallowed_user_agents`` annotated (robots_filter.py:88).

Spark shape: broadcast the robots dict (domains ≪ docs), evaluate with an
Arrow-batched ``mapInPandas`` keeping a per-executor parsed-rule cache —
the lru_cache analogue, built once per worker not per row. The parser is a
minimal implementation of the public robots.txt format (user-agent groups,
Disallow/Allow prefix rules, longest-match wins) — the container has no
Protego; semantics documented by the public REP spec.

Scale: the only movement of the robots table is ONE broadcast; documents
stream through a narrow stage. Skew-free (per-row work is bounded by rule
count of one domain).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the 16 AI crawler user agents the reference checks (robots_filter.py:11-27).
AI_USER_AGENTS = [
    "GPTBot", "ChatGPT-User", "Google-Extended", "CCBot", "anthropic-ai",
    "ClaudeBot", "Claude-Web", "cohere-ai", "PerplexityBot", "Applebot-Extended",
    "FacebookBot", "Meta-ExternalAgent", "Bytespider", "Amazonbot", "YouBot",
    "Diffbot",
]


def parse_robots(content: str) -> dict[str, list[tuple[str, bool]]]:
    """Parse robots.txt → {lower(agent): [(path_prefix, allowed), ...]}.

    Public REP format: '*' group applies to any agent without a specific
    group; longest-prefix rule wins; empty Disallow means allow-all.
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


def is_allowed(groups: dict[str, list[tuple[str, bool]]], agent: str, path: str) -> bool:
    rules = groups.get(agent.lower())
    if rules is None:
        rules = groups.get("*", [])
    best_len, allowed = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix) and len(prefix) > best_len:
            best_len, allowed = len(prefix), allow
    return allowed


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
    bc = spark.sparkContext.broadcast(robots_map)

    from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import HOST_REGEX, PATH_REGEX

    with_parts = docs.withColumn("__host", F.regexp_extract(F.col(url_col), HOST_REGEX, 1)) \
                     .withColumn("__path", F.regexp_extract(F.col(url_col), PATH_REGEX, 1))

    out_fields = ", ".join(f"{name} {dtype}" for name, dtype in with_parts.dtypes
                           if not name.startswith("__"))
    schema = out_fields + ", disallowed_user_agents array<string>"
    keep_cols = [name for name, _ in with_parts.dtypes if not name.startswith("__")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value

        @lru_cache(maxsize=8192)  # per-executor parser cache (robots_filter.py:43)
        def parsed(domain: str):
            content = table.get(domain)
            return parse_robots(content) if content else None

        for pdf in batches:
            denied = []
            for host, path in zip(pdf["__host"], pdf["__path"]):
                groups = parsed(host) if host else None
                if groups is None:
                    denied.append([])
                    continue
                denied.append(
                    [a for a in agents if not is_allowed(groups, a, path or "/")]
                )
            out = pdf[keep_cols].copy()
            out["disallowed_user_agents"] = denied
            yield out

    return with_parts.mapInPandas(run, schema)


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

    def run(batches):
        from functools import lru_cache

        @lru_cache(maxsize=8192)
        def parsed(content: str):
            return parse_robots(content)

        for pdf in batches:
            denied = []
            for content, path in zip(pdf["__robots"], pdf["__path"]):
                if content is None:
                    denied.append([])
                    continue
                groups = parsed(content)
                denied.append([a for a in agents if not is_allowed(groups, a, path or "/")])
            out = pdf[keep_cols].copy()
            out["disallowed_user_agents"] = denied
            yield out

    return joined.mapInPandas(run, schema)
