"""SFT extraction semantics (operators/sft.py): chat-template render,
bounded-context example cutting, left truncation, and loss-mask span
correctness — asserted against hand-computable mini-conversations, plus
offset/hash invariants on the t1 fixture tier."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.sft import (
    TURN_END,
    conversation_masked_sequence,
    sft_examples,
)


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 0, 0, i)


def _conv(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, "none", _ts(i)) for (c, i, r, t) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _render(role: str, text: str) -> str:
    return f"<|{role}|>\n{text}\n{TURN_END}"


def test_sft_examples_context_and_filter(spark):
    df = _conv(
        spark,
        [
            ("c1", 1, "system", "sys"),
            ("c1", 2, "user", "hi"),
            ("c1", 3, "assistant", "hello"),
            ("c1", 4, "user", "more"),
            ("c1", 5, "assistant", "sure"),
            # assistant turn with NO context: dropped
            ("c2", 1, "assistant", "orphan"),
        ],
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(df, max_context_turns=2).collect()
    }
    assert set(out) == {("c1", 3), ("c1", 5)}
    ex3 = out[("c1", 3)]
    # frame is the 2 turns immediately preceding, in stable order
    assert ex3["prompt"] == _render("system", "sys") + _render("user", "hi")
    assert ex3["completion"] == "hello"
    assert ex3["n_context_turns"] == 2
    assert ex3["completion_tokens"] == 1
    ex5 = out[("c1", 5)]
    # the earlier assistant turn is context too (frame is positional)
    assert ex5["prompt"] == _render("assistant", "hello") + _render("user", "more")


def test_sft_examples_left_truncation(spark):
    df = _conv(
        spark,
        [
            ("c1", 1, "user", "A" * 50),
            ("c1", 2, "user", "B" * 50),
            ("c1", 3, "assistant", "done"),
        ],
    )
    full = _render("user", "A" * 50) + _render("user", "B" * 50)
    n = 30
    (row,) = sft_examples(df, max_context_turns=4, max_prompt_chars=n).collect()
    assert row["prompt"] == full[-n:]  # rightmost chars survive
    assert row["prompt_chars"] == n


def test_masked_sequence_offsets_address_assistant_turns(spark):
    rows = [
        ("c1", 1, "user", "ask"),
        ("c1", 2, "assistant", "answer"),
        ("c1", 3, "tool", "LOG ok"),
        ("c1", 4, "assistant", "final"),
    ]
    df = _conv(spark, rows)
    (out,) = conversation_masked_sequence(df).collect()
    seq = "".join(_render(r, t) for (_, _, r, t) in rows)
    assert out["n_turns"] == 4
    assert out["n_chars"] == len(seq)
    assert out["seq_md5"] == hashlib.md5(seq.encode()).hexdigest()
    spans = [tuple(map(int, s.split("-"))) for s in out["mask_csv"].split(";")]
    assert [seq[a:b] for a, b in spans] == [
        _render("assistant", "answer"),
        _render("assistant", "final"),
    ]
    assert out["trainable_chars"] == sum(b - a for a, b in spans)


def test_masked_sequence_no_trainable_turns_is_null_mask(spark):
    df = _conv(spark, [("c1", 1, "user", "only"), ("c1", 2, "tool", "x")])
    (out,) = conversation_masked_sequence(df).collect()
    assert out["mask_csv"] is None
    assert out["trainable_chars"] == 0
    assert out["trainable_frac"] == 0.0


def test_null_role_and_text_render_empty_not_null(spark):
    df = _conv(spark, [("c1", 1, None, None), ("c1", 2, "assistant", "ok")])
    (out,) = conversation_masked_sequence(df).collect()
    # the malformed turn still occupies its rendered slot
    seq = _render("", "") + _render("assistant", "ok")
    assert out["n_chars"] == len(seq)
    assert out["seq_md5"] == hashlib.md5(seq.encode()).hexdigest()
    (ex,) = sft_examples(df).collect()
    assert ex["n_context_turns"] == 1
    assert ex["prompt"] == _render("", "")


def test_fixture_tier_invariants(spark, t1):
    exs = sft_examples(t1, max_context_turns=6, max_prompt_chars=400)
    bad = exs.where(
        (F.col("prompt_chars") > 400)
        | (F.col("n_context_turns") > 6)
        | (F.col("n_context_turns") < 1)
        | (F.length("prompt") != F.col("prompt_chars"))
    ).count()
    assert bad == 0
    seqs = conversation_masked_sequence(t1)
    # spans never overlap and never exceed the sequence length
    exploded = seqs.where(F.col("mask_csv").isNotNull()).select(
        "conv_id",
        "n_chars",
        F.explode(F.split("mask_csv", ";")).alias("span"),
    ).select(
        "conv_id",
        "n_chars",
        F.split("span", "-")[0].cast("long").alias("a"),
        F.split("span", "-")[1].cast("long").alias("b"),
    )
    assert exploded.where((F.col("a") >= F.col("b")) | (F.col("b") > F.col("n_chars"))).count() == 0
    # per-conv trainable_chars == sum of span widths
    agg = exploded.groupBy("conv_id").agg(F.sum(F.col("b") - F.col("a")).alias("w"))
    joined = seqs.join(agg, "conv_id", "inner").where(F.col("w") != F.col("trainable_chars"))
    assert joined.count() == 0


def test_preference_pairs_pick_and_margin(spark):
    from opentelemetry_collector_contrib_spark.operators.sft import preference_pairs

    df = spark.createDataFrame(
        [
            ("k1", "short", 1.0),
            ("k1", "a much longer reply", 4.0),
            ("k1", "medium reply", 2.0),
            # tie group: two completions, equal scores -> dropped
            ("k2", "aaa", 2.0),
            ("k2", "bbb", 2.0),
            # single-completion group (duplicated row) -> dropped
            ("k3", "only", 3.0),
            ("k3", "only", 3.0),
        ],
        "prompt_key string, completion string, score double",
    )
    out = {r["prompt_key"]: r for r in preference_pairs(df).collect()}
    assert set(out) == {"k1"}
    r = out["k1"]
    assert r["chosen"] == "a much longer reply"
    assert r["rejected"] == "short"
    assert r["margin"] == 3.0
    assert r["n_candidates"] == 3
    # without the margin requirement the tie group survives, picked by bytes
    loose = {
        r["prompt_key"]: r
        for r in preference_pairs(df, require_margin=False).collect()
    }
    assert set(loose) == {"k1", "k2"}
    assert loose["k2"]["chosen"] == "bbb" and loose["k2"]["rejected"] == "aaa"
    assert loose["k2"]["margin"] == 0.0


def test_preference_pairs_deterministic_tiebreak_within_score(spark):
    from opentelemetry_collector_contrib_spark.operators.sft import preference_pairs

    # chosen score ties: lexicographically-largest completion wins
    df = spark.createDataFrame(
        [("k", "zebra", 5.0), ("k", "apple", 5.0), ("k", "low", 1.0)],
        "prompt_key string, completion string, score double",
    )
    (r,) = preference_pairs(df).collect()
    assert r["chosen"] == "zebra" and r["rejected"] == "low"
