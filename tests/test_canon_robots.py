"""Unicode canonicalization and the robots.txt longest-match gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.curation import (
    canonicalize_text,
    robots_gate,
)


def _canon(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return canonicalize_text(df).first().canon_text


def test_decomposed_and_precomposed_converge(spark):
    # U+00E9 (precomposed) and e + U+0301 (combining) must canonicalize
    # to the same bytes — the crawl-duplicate class exact dedup misses
    # without NFC.
    assert _canon(spark, "café") == _canon(spark, "café")


def test_case_and_whitespace_fold(spark):
    assert _canon(spark, "  The\tQuick\n\nBrown  fox ") == "the quick brown fox"


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert canonicalize_text(df).first().canon_text is None


def test_dedup_key_convergence_end_to_end(spark):
    rows = [
        (1, "Café du Monde"),
        (2, "café du  monde"),
        (3, "CAFÉ DU MONDE"),
        (4, "something else"),
    ]
    df = canonicalize_text(spark.createDataFrame(rows, "doc_id long, text string"))
    groups = df.groupBy("canon_text").count().collect()
    counts = sorted(r["count"] for r in groups)
    assert counts == [1, 3]


def _rules(spark):
    return spark.createDataFrame(
        [
            ("ex.com", "/private", False),
            ("ex.com", "/private/archive", True),
            ("ex.com", "/private/archive/tmp", False),
            ("deny.all", "/", False),
        ],
        "domain string, prefix string, allow boolean",
    )


def test_robots_longest_match_chain(spark):
    rows = [
        (1, "ex.com", "/public"),
        (2, "ex.com", "/private/x"),
        (3, "ex.com", "/private/archive/x"),
        (4, "ex.com", "/private/archive/tmp/x"),
        (5, "deny.all", "/anything"),
        (6, "norules.org", "/private/x"),
        (7, None, "/private/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, path string")
    out = {r.doc_id: (r.rg_allow, r.rg_rule) for r in robots_gate(df, "host", "path", _rules(spark)).collect()}
    assert out[1] == (True, None)  # no rule matched -> REP default allow
    assert out[2] == (False, "/private")
    assert out[3] == (True, "/private/archive")  # allow overrides inside deny
    assert out[4] == (False, "/private/archive/tmp")  # deeper deny re-overrides
    assert out[5] == (False, "/")
    assert out[6] == (True, None)
    assert out[7] == (True, None)  # unattributable host passes


def test_robots_tie_prefers_allow(spark):
    rules = spark.createDataFrame(
        [("d", "/a", False), ("d", "/a", True)],
        "domain string, prefix string, allow boolean",
    )
    df = spark.createDataFrame([(1, "d", "/a/x")], "doc_id long, host string, path string")
    assert robots_gate(df, "host", "path", rules).first().rg_allow is True


def test_robots_plan_broadcasts_rules(spark):
    df = spark.createDataFrame(
        [(i, "ex.com", f"/p/{i}") for i in range(100)],
        "doc_id long, host string, path string",
    )
    plan = (
        robots_gate(df, "host", "path", _rules(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
