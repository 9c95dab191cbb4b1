"""Unit tests for operators/profiling.py, dedup.containment_pairs and
curation.canonicalize_url — edge semantics the registry oracle queries
don't isolate (all-NULL columns, empty input, directed containment
asymmetry, URL normalization rule table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.curation import canonicalize_url
from opentelemetry_collector_contrib_spark.operators.dedup import containment_pairs
from opentelemetry_collector_contrib_spark.operators.profiling import (
    column_profile,
    key_skew_profile,
)


def test_key_skew_profile_values(spark):
    # 6 rows of 'a', 2 of 'b', 1 each of 'c','d' → total 10, 4 keys
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r["k"]: r for r in key_skew_profile(df, ["k"], top_n=2).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n"] == 6 and out["a"]["rank"] == 1
    assert abs(out["a"]["frac"] - 0.6) < 1e-9
    # uniform expectation = 10/4 = 2.5 rows/key → a's skew factor 2.4
    assert abs(out["a"]["skew_factor"] - 2.4) < 1e-9
    assert out["b"]["rank"] == 2 and abs(out["b"]["skew_factor"] - 0.8) < 1e-9


def test_key_skew_profile_tie_break_and_empty(spark):
    df = spark.createDataFrame([("b",), ("a",)], "k string")
    ranks = {r["k"]: r["rank"] for r in key_skew_profile(df, ["k"], top_n=5).collect()}
    assert ranks == {"a": 1, "b": 2}  # equal counts → key asc decides
    empty = spark.createDataFrame([], "k string")
    assert key_skew_profile(empty, ["k"]).count() == 0


def test_column_profile_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [("x", None, 1), ("x", None, 2), ("yy", None, 2)],
        "a string, b string, c int",
    )
    out = {r["column"]: r for r in column_profile(df).collect()}
    assert out["a"]["n_rows"] == 3 and out["a"]["n_null"] == 0
    assert out["a"]["n_distinct"] == 2
    assert abs(out["a"]["avg_len"] - (1 + 1 + 2) / 3) < 1e-6
    # all-NULL column: zero distinct, NULL avg_len
    assert out["b"]["n_null"] == 3 and out["b"]["n_distinct"] == 0
    assert out["b"]["avg_len"] is None
    assert out["c"]["n_distinct"] == 2 and out["c"]["avg_len"] == 1.0


def test_containment_directed_asymmetry(spark):
    # small = 5 tokens → 3 shingles, all inside big (12 tokens, 10 shingles)
    small = "w1 w2 w3 w4 w5"
    big = small + " w6 w7 w8 w9 w10 w11 w12"
    df = spark.createDataFrame([(1, small), (2, big)], "doc_id long, text string")
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", threshold=0.0).collect()
    }
    assert rows[(1, 2)] == 1.0  # small fully contained in big
    assert abs(rows[(2, 1)] - 0.3) < 1e-6  # 3 of big's 10 shingles shared
    # jaccard for this pair is 0.3 — a 0.5 containment threshold keeps only
    # the small→big direction, the case resemblance misses
    kept = containment_pairs(df, "doc_id", threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in kept] == [(1, 2)]


def test_containment_max_doc_freq_lower_bound(spark):
    # a shingle shared by all 3 docs is capped out at max_doc_freq=2:
    # intersections shrink, |A| doesn't → capped score <= exact score
    t = "a b c"
    df = spark.createDataFrame(
        [(1, t), (2, t + " x y z"), (3, t + " p q r")], "doc_id long, text string"
    )
    exact = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", threshold=0.0).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", threshold=0.0, max_doc_freq=2).collect()
    }
    for k, v in capped.items():
        assert v <= exact[k] + 1e-9


URL_CASES = [
    # (input, canonical)
    ("http://Example.COM:80/a?b=1#frag", "http://example.com/a?b=1"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
    ("http://example.com", "http://example.com/"),  # empty path → /
    ("http://example.com/a?utm_source=x&b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?UTM_Source=x", "http://example.com/a"),  # case-insensitive
    ("http://example.com/a?gclid=1&fbclid=2&ref=x", "http://example.com/a"),
    ("http://example.com/a?refresh=1", "http://example.com/a?refresh=1"),  # not 'ref'
    ("http://example.com/a?", "http://example.com/a"),  # empty query dropped
    ("HTTP://example.com/A/B", "http://example.com/A/B"),  # path case preserved
    ("no-scheme.com/a", None),  # unparseable → NULL
]


def test_canonicalize_url_table(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], "i long, url string"
    )
    got = {r["i"]: r for r in canonicalize_url(df).collect()}
    for i, (u, want) in enumerate(URL_CASES):
        assert got[i]["canonical_url"] == want, (u, got[i]["canonical_url"], want)
    # NULL canonical → NULL key; equal canonicals → equal keys
    assert got[len(URL_CASES) - 1]["url_key"] is None


def test_canonicalize_url_collapses_variants(spark):
    variants = [
        "http://example.com/p/1?b=2&a=1",
        "HTTP://EXAMPLE.com:80/p/1?a=1&b=2#x",
        "http://example.com/p/1?a=1&utm_medium=m&b=2",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)], "i long, url string")
    keys = {r["url_key"] for r in canonicalize_url(df).collect()}
    assert len(keys) == 1


def test_profile_plan_shapes(spark):
    """column_profile: one scan, two fixed-width exchanges (distinct
    partial-dedup + final); key_skew's top-n rank plans as
    TakeOrderedAndProject — per-partition top-k, never a global sort of
    the key universe."""
    df = spark.createDataFrame([("a", 1)] * 4 + [("b", 2)], "k string, v int")
    plan = column_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert plan.count("Scan") == 1
    skew_plan = (
        key_skew_profile(df, ["k"], top_n=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in skew_plan


def test_dup_cluster_sizes_includes_singletons(spark):
    from opentelemetry_collector_contrib_spark.operators.dedup import dup_cluster_sizes

    corpus = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # {0,1,2} one cluster, {3,4} another, 5 singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    out = {r["cluster_size"]: r for r in dup_cluster_sizes(corpus, pairs).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1
    assert out[1]["n_clusters"] == 1  # doc 5 counted
    assert abs(sum(r["frac_docs"] for r in out.values()) - 1.0) < 1e-5


def test_sniff_content_type_table(spark):
    from opentelemetry_collector_contrib_spark.operators.multimodal import (
        sniff_content_type,
    )

    cases = [
        (0, bytes.fromhex("89504E470D0A1A0A") + b"rest", "image/png"),
        (1, b"\xff\xd8\xff\xe0body", "image/jpeg"),
        (2, b"GIF87a..", "image/gif"),
        (3, b"%PDF-1.4", "application/pdf"),
        (4, b"\x1f\x8b\x08\x00", "application/gzip"),
        (5, b"PK\x03\x04zz", "application/zip"),
        (6, b"\x7fELF\x02", "application/x-elf"),
        (7, b"ID3\x04tag", "audio/mpeg"),
        (8, b"RIFF\x00\x00\x00\x24WAVEfmt ", "audio/wav"),
        (9, b"RIFF\x00\x00\x00\x24WEBPVP8 ", "image/webp"),
        (10, b"RIFF\x00\x00\x00\x24AVI LIST", "video/avi"),
        (11, b"RIFF\x00\x00\x00\x24XXXX", "application/octet-stream"),  # unknown RIFF
        (12, b"plain text", "application/octet-stream"),
        (13, b"", "application/octet-stream"),
        (14, None, None),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "i long, payload binary"
    )
    got = {r["i"]: r["content_type"] for r in sniff_content_type(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_stratified_sample_deterministic_and_capped(spark):
    from opentelemetry_collector_contrib_spark.operators.curation import (
        stratified_sample,
    )

    rows = [(i, "a" if i < 20 else "b") for i in range(23)]  # b has only 3
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out1 = stratified_sample(df, ["src"], k=5).collect()
    out2 = stratified_sample(df, ["src"], k=5).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)
    by_src = {}
    for r in out1:
        by_src.setdefault(r["src"], []).append(r["strata_rank"])
    assert sorted(by_src["a"]) == [1, 2, 3, 4, 5]
    assert sorted(by_src["b"]) == [1, 2, 3]  # short stratum returns whole
    # picks for stratum 'a' are independent of 'b' rows existing at all
    only_a = stratified_sample(df.filter("src = 'a'"), ["src"], k=5).collect()
    assert {r["doc_id"] for r in only_a} == {
        r["doc_id"] for r in out1 if r["src"] == "a"
    }


def test_bootstrap_ci_sane_and_deterministic(spark):
    from opentelemetry_collector_contrib_spark.operators.profiling import bootstrap_ci

    import math

    rows = [(f"d{i}", float((i * 37) % 200)) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id string, v double")
    r1 = bootstrap_ci(df, "doc_id", "v", replicas=32).collect()[0]
    r2 = bootstrap_ci(df, "doc_id", "v", replicas=32).collect()[0]
    assert r1 == r2  # deterministic weights -> identical interval
    assert r1["n"] == 600
    mean = sum(v for _, v in rows) / 600
    assert r1["est"] == pytest.approx(mean, abs=1e-4)
    sd = math.sqrt(sum((v - mean) ** 2 for _, v in rows) / 599)
    theo_se = sd / math.sqrt(600)
    # bootstrap SE should land near the analytic SE (wide tolerance: B=32)
    assert 0.5 * theo_se < r1["se"] < 2.0 * theo_se
    assert r1["ci_lo"] < r1["est"] < r1["ci_hi"]


def test_bootstrap_ci_constant_corpus_zero_se(spark):
    from opentelemetry_collector_contrib_spark.operators.profiling import bootstrap_ci

    df = spark.createDataFrame([(f"d{i}", 7.0) for i in range(50)], "doc_id string, v double")
    r = bootstrap_ci(df, "doc_id", "v", replicas=8).collect()[0]
    assert r["se"] == pytest.approx(0.0)
    assert r["ci_lo"] == pytest.approx(7.0)

    with pytest.raises(ValueError):
        bootstrap_ci(df, "doc_id", "v", replicas=1)


def test_benford_audit_uniform_vs_benford(spark):
    import math

    from opentelemetry_collector_contrib_spark.operators.profiling import benford_audit

    # perfect Benford sample: digit d appears round(P(d)*1000) times
    rows = []
    for d in range(1, 10):
        n_d = round(math.log10(1 + 1 / d) * 1000)
        rows += [("b", float(d * 10))] * n_d
    # uniform digits 1..9 (anti-Benford): chi2 must be much larger
    for d in range(1, 10):
        rows += [("u", float(d))] * 100
    # skipped rows: |v| < 1 and zero
    rows += [("b", 0.5), ("b", 0.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in benford_audit(df, "v", by=["g"]).collect()}
    assert out["b"]["n_skipped"] == 2
    assert out["b"]["benford_chi2"] < 1.0  # near-perfect fit
    assert out["u"]["benford_chi2"] > 100.0
    assert out["b"]["d1"] == 301


def test_gini_and_lorenz_extremes(spark):
    from opentelemetry_collector_contrib_spark.operators.profiling import (
        gini_concentration,
        lorenz_deciles,
    )

    # perfectly equal masses -> gini 0; one row holds everything -> gini -> 1
    eq = spark.createDataFrame([("e", 10.0)] * 50, "g string, v double")
    un = spark.createDataFrame(
        [("u", 0.000001)] * 49 + [("u", 1000.0)], "g string, v double"
    )
    both = eq.union(un)
    out = {r["g"]: r for r in gini_concentration(both, "v", by=["g"]).collect()}
    assert out["e"]["gini"] == pytest.approx(0.0, abs=1e-6)
    assert out["u"]["gini"] > 0.95
    # hand case: values 1,2,3 -> G = 2*(1+4+9)/(3*6) - 4/3 = 28/18 - 24/18 = 2/9
    h = spark.createDataFrame([("h", 1.0), ("h", 2.0), ("h", 3.0)], "g string, v double")
    assert gini_concentration(h, "v", by=["g"]).collect()[0]["gini"] == pytest.approx(2 / 9)

    lz = {r["decile"]: r for r in lorenz_deciles(eq, "v", by=["g"]).collect()}
    assert lz[10]["cum_share"] == 1.0
    assert lz[5]["cum_share"] == pytest.approx(0.5)  # equal masses: linear Lorenz
