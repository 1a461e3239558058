"""robots.txt compliance gate (operators/robots.py): RFC 9309 group
selection, longest-match precedence, allow-tie-break, wildcards/$,
default-allow, and the broadcast-join plan shape."""

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.operators import robots as R


def test_parse_robots_txt_groups_and_rules():
    txt = (
        "# comment\n"
        "User-agent: mybot\n"
        "User-agent: otherbot\n"
        "Disallow: /private/\n"
        "Allow: /private/ok*\n"
        "Crawl-delay: 10\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
        "Disallow:\n"  # empty value: a no-op, not allow-all
        "Sitemap: https://x/s.xml\n"
    )
    rules = R.parse_robots_txt(txt, "Example.COM")
    assert all(r["domain"] == "example.com" for r in rules)
    # two agents × two rules + one star rule
    agents = sorted({r["agent"] for r in rules})
    assert agents == ["*", "mybot", "otherbot"]
    star = [r for r in rules if r["agent"] == "*"]
    assert len(star) == 1 and star[0]["pattern"] == "^/"
    mybot = [r for r in rules if r["agent"] == "mybot"]
    assert {(r["pattern"], r["allow"]) for r in mybot} == {
        ("^/private/", False),
        ("^/private/ok.*", True),
    }
    # specificity is the raw pattern length (pre-translation)
    assert {r["specificity"] for r in mybot} == {9, 12}


def test_pattern_translation():
    assert R._pattern_to_regex("/a/*.pdf$") == r"^/a/.*\.pdf$"
    assert R._pattern_to_regex("/plain") == "^/plain"
    # regex metacharacters in paths are literals
    assert R._pattern_to_regex("/a+b(c)") == r"^/a\+b\(c\)"


@pytest.fixture(scope="module")
def gate_tables(spark):
    robots = spark.createDataFrame(
        [
            ("site0.example", "User-agent: *\nDisallow: /private/"),
            ("site1.example",
             "User-agent: *\nDisallow: /\nAllow: /public/"),
            ("site2.example",
             "User-agent: mybot\nDisallow: /mybot-only/\n\n"
             "User-agent: *\nDisallow: /"),
            ("site3.example", "User-agent: *\nDisallow: /*.pdf$"),
            ("site4.example", "# nothing here"),
        ],
        "domain string, robots_txt string",
    )
    urls = [
        "https://site0.example/private/x",   # blocked
        "https://site0.example/open/x",      # allowed
        "https://site1.example/public/doc",  # allow beats / (longer)
        "https://site1.example/other",       # blocked by /
        "https://site2.example/anything",    # mybot group: allowed
        "https://site2.example/mybot-only/a",  # mybot group: blocked
        "https://site3.example/paper.pdf",   # $-anchored: blocked
        "https://site3.example/paper.pdfx",  # $ means END: allowed
        "https://site4.example/x",           # no rules: allowed
        "https://unknown.example/x",         # no robots at all: allowed
    ]
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return docs, R.robots_rules(robots)


def test_robots_gate_semantics(spark, gate_tables):
    docs, rules = gate_tables
    kept = sorted(
        r.doc_id
        for r in R.robots_gate(docs, rules, agent="mybot").collect()
    )
    assert kept == [1, 2, 4, 7, 8, 9]
    # a generic agent has no site2 group → the '*' group blocks it
    kept_star = sorted(
        r.doc_id
        for r in R.robots_gate(docs, rules, agent="somebot").collect()
    )
    assert kept_star == [1, 2, 7, 8, 9]
    # keep_col flags instead of filtering; row count preserved
    flagged = R.robots_gate(docs, rules, agent="mybot", keep_col="ok")
    assert flagged.count() == docs.count()
    assert sorted(
        r.doc_id for r in flagged.filter("ok").collect()
    ) == [1, 2, 4, 7, 8, 9]


def test_robots_gate_plan_broadcasts(spark, gate_tables):
    docs, rules = gate_tables
    gated = R.robots_gate(docs, rules, agent="mybot")
    plan = gated._jdf.queryExecution().executedPlan().toString()
    # the rule-table joins stay broadcast (tiny, rule-derived)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the verdict frame is corpus-derived: it must carry NO forced
    # broadcast hint (exactly the two rule-table hints survive
    # analysis — has_agent and the pattern join's applicable side).
    analyzed = gated._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 2
    # the verdict aggregate combines map-side before its exchange
    assert "partial_max_by" in plan or "partial_max" in plan
