"""Dictionary phrase tagging — word-boundary n-gram matching against a
broadcast lexicon (operators/dict_tag.py)."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.dict_tag import tag_matches, tag_summary


def _dict(spark):
    return spark.createDataFrame(
        [
            ("privacy", "policy"),
            ("credit card", "pii"),
            ("machine learning", "topic"),
            ("large language model", "topic"),
        ],
        "term string, tag string",
    )


def test_phrase_matching_positions_and_normalization(spark):
    docs = spark.createDataFrame(
        [
            (1, "Our Privacy, policy covers CREDIT card data."),
            (2, "large language model training uses machine learning."),
            (3, "no matches here"),
        ],
        "doc_id int, text string",
    )
    m = tag_matches(docs, _dict(spark)).collect()
    got = {(r["doc_id"], r["term"], r["pos"]) for r in m}
    # edge punctuation stripped, case folded; positions are token indexes
    assert (1, "privacy", 1) in got
    assert (1, "credit card", 4) in got
    assert (2, "large language model", 0) in got
    assert (2, "machine learning", 5) in got
    assert not any(r["doc_id"] == 3 for r in m)


def test_summary_is_total_with_sorted_csvs(spark):
    docs = spark.createDataFrame(
        [(1, "credit card privacy credit card"), (2, "nothing")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in tag_summary(docs, _dict(spark)).collect()}
    assert out[1]["hits"] == 3
    assert out[1]["tags_csv"] == "pii,policy"
    assert out[1]["terms_csv"] == "credit card,privacy"
    assert out[2]["hits"] == 0 and out[2]["tags_csv"] == ""


def test_short_docs_and_plan_shape(spark):
    docs = spark.createDataFrame([(1, "hi"), (2, "")], "doc_id int, text string")
    out = tag_summary(docs, _dict(spark))
    assert out.count() == 2  # sub-n-gram docs never error
    plan = tag_matches(docs, _dict(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dictionary ships once per executor
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unicode_tokens_survive_normalization(spark):
    d = spark.createDataFrame([("café", "place"), ("naïve bayes", "topic")], "term string, tag string")
    docs = spark.createDataFrame(
        [(1, "Visit the (café)! Naïve Bayes wins.")], "doc_id int, text string"
    )
    out = tag_summary(docs, d).collect()[0]
    assert out["hits"] == 2
    assert out["terms_csv"] == "café,naïve bayes"


def test_matches_equal_python_reference_on_random_corpora():
    """Property: tag_matches == a brute-force Python n-gram matcher on
    random token streams over a small alphabet (guarantees no window is
    missed or duplicated at array edges)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from opentelemetry_collector_contrib_spark.session import get_spark

    spark = get_spark("pytest", master="local[4]", shuffle_partitions=8)
    words = ["alpha", "beta", "gamma", "x1", "y"]
    docs_strat = st.lists(
        st.lists(st.sampled_from(words), min_size=0, max_size=12), min_size=1, max_size=15
    )

    terms = ["alpha", "beta gamma", "x1 y alpha", "y y"]
    dictionary = spark.createDataFrame(
        [(t, f"tag{i}") for i, t in enumerate(terms)], "term string, tag string"
    )

    @settings(max_examples=5, deadline=None)
    @given(docs_strat)
    def run(token_lists):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            (r["doc_id"], r["pos"], r["term"])
            for r in tag_matches(df, dictionary).collect()
        }
        want = set()
        for i, toks in enumerate(token_lists):
            for n in (1, 2, 3):
                for p in range(len(toks) - n + 1):
                    gram = " ".join(toks[p : p + n])
                    if gram in terms:
                        want.add((i, p, gram))
        assert got == want

    run()
