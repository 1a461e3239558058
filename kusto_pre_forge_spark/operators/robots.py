"""robots.txt compliance gate (RFC 9309) — the crawl-corpus curation
step between fetching and training: drop (or flag) documents whose URL
the site's robots rules disallow for your crawler's user-agent. Every
responsible crawl corpus (Common Crawl itself, C4's source, the
compliance pass most dataset cards now describe) applies exactly this
gate; it composes with ``textprep.domain_blocklist_filter`` (blocklist
first, robots second).

Spark-first shape: robots FILES parse into a (domain, agent, pattern,
allow, specificity) RULE TABLE — thousands of rows per million
documents, never corpus-sized — which BROADCASTS; the gate is one
broadcast join on the URL's host plus a rank window over the (tiny)
matched-rule set per document. Rule matching runs JVM-side
(``regexp_like`` with the pre-translated pattern column); the corpus
never shuffles.

Semantics implemented (RFC 9309 §2.2):
- group selection: the group whose ``User-agent`` exactly matches the
  crawler's product token (case-insensitive) when the site defines one,
  else the ``*`` group; no applicable group → everything is allowed;
- rule precedence: the LONGEST (most specific) matching pattern wins;
  on a specificity tie the ALLOW rule wins (least-restrictive tie-break
  — the rule Google's reference parser applies);
- ``*`` wildcards and the ``$`` end anchor in paths; empty-value rules
  are no-ops; matching is against the URL path (query strings are not
  part of the gate, the common-parser behavior).

Parity note: the reference (microsoft/kusto-pre-forge) has no crawl
surface — this is LLM-pipeline extension surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_DDL = (
    "domain string, agent string, pattern string, allow boolean, "
    "specificity int"
)


def _pattern_to_regex(path: str) -> str:
    """One robots path pattern → an anchored RE2-safe regex: literal
    chars escaped, ``*`` → ``.*``, a trailing ``$`` anchors the end."""
    anchored_end = path.endswith("$")
    if anchored_end:
        path = path[:-1]
    parts = [re.escape(p) for p in path.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored_end else "")


def parse_robots_txt(txt: str, domain: str) -> list[dict]:
    """RFC 9309 group parse of ONE robots.txt → rule rows. Consecutive
    ``User-agent`` lines open a group shared by all named agents;
    ``Allow``/``Disallow`` lines attach to the open group. Unknown
    directives (Crawl-delay, Sitemap, …) and comments are skipped."""
    rules: list[dict] = []
    agents: list[str] = []
    domain = str(domain).lower()
    group_open = False  # True while collecting user-agent lines
    for raw_line in (txt or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(val.lower())
            continue
        group_open = False
        if key not in ("allow", "disallow") or not agents:
            continue
        if not val:
            continue  # empty pattern matches nothing (a no-op rule)
        for agent in agents:
            rules.append(
                {
                    "domain": domain,
                    "agent": agent,
                    "pattern": _pattern_to_regex(val),
                    "allow": key == "allow",
                    "specificity": len(val),
                }
            )
    return rules


def robots_rules(
    robots_df: DataFrame,
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Parse a (domain, robots_txt) table into the broadcastable rule
    table — one Arrow map stage (robots files are small; the output is
    rules, not text)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows: list[dict] = []
            for dom, txt in zip(pdf[domain_col], pdf[txt_col]):
                rows.extend(
                    parse_robots_txt(
                        txt if isinstance(txt, str) else "",
                        str(dom).lower(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "domain", "agent", "pattern", "allow", "specificity",
                ],
            )

    return robots_df.select(domain_col, txt_col).mapInPandas(
        batches, ROBOTS_RULES_DDL
    )


def _url_path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def robots_gate(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    keep_col: str | None = None,
) -> DataFrame:
    """Gate a document table by the robots rule table (output of
    :func:`robots_rules`). Rows whose URL the applicable group
    disallows are dropped (or flagged via ``keep_col``); no matching
    rule, no applicable group, or no URL host → allowed (RFC 9309's
    default-allow posture).

    Plan: the rule table broadcasts twice — once as a per-domain
    "has a group for this agent" flag (a tiny aggregate), once for the
    pattern join — and precedence is one map-side-combinable aggregate
    over the matched rows (``max_by(allow, struct(specificity,
    allow))``: the longest-match rule wins, allow wins ties, RFC 9309
    §2.2.2). Only the rows that matched ANY rule shuffle (one hash
    exchange keyed by url for the aggregate and the rejoin, which AQE
    plans together); the verdict frame is corpus-derived and therefore
    deliberately NOT broadcast — on a crawl where sites publish broad
    ``Disallow:`` patterns it is corpus-scale, and Catalyst may still
    pick a broadcast on its own when stats prove it small."""
    agent = agent.lower()
    host = F.lower(F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")), F.lit("")))
    docs = df.withColumn("_kpf_dom", host).withColumn(
        "_kpf_path", _url_path(F.col(url_col))
    )
    # group selection: domains with rules for THIS agent use them;
    # everyone else falls back to the '*' group
    has_agent = (
        rules.filter(F.col("agent") == agent)
        .select("domain")
        .distinct()
        .withColumn("_kpf_has_agent", F.lit(True))
    )
    applicable = (
        rules.filter(F.col("agent").isin(agent, "*"))
        .join(F.broadcast(has_agent), "domain", "left")
        .filter(
            F.when(
                F.coalesce(F.col("_kpf_has_agent"), F.lit(False)),
                F.col("agent") == agent,
            ).otherwise(F.col("agent") == "*")
        )
        .select("domain", "pattern", "allow", "specificity")
    )
    matched = docs.select(
        F.col(url_col), F.col("_kpf_dom"), F.col("_kpf_path")
    ).join(
        F.broadcast(applicable),
        (F.col("_kpf_dom") == F.col("domain"))
        & F.regexp_like(F.col("_kpf_path"), F.col("pattern")),
        "inner",
    )
    verdicts = matched.groupBy(url_col).agg(
        F.max_by("allow", F.struct("specificity", "allow")).alias(
            "_kpf_allow"
        )
    )
    out = (
        docs.join(verdicts, url_col, "left")
        .withColumn(
            "_kpf_keep", F.coalesce(F.col("_kpf_allow"), F.lit(True))
        )
        .drop("_kpf_dom", "_kpf_path", "_kpf_allow")
    )
    if keep_col is not None:
        return out.withColumnRenamed("_kpf_keep", keep_col)
    return out.filter(F.col("_kpf_keep")).drop("_kpf_keep")
