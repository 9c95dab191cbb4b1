"""Transcript-QA operator semantics on hand-built conversations.

Pins the behaviors the fixture can't isolate: chain splitting at a
success, the recovered flag at run end, orphan-tool/first-turn edge
cases, digest equality for identical conversations, and loop spans.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.conv_qa import (
    conv_exact_dedup,
    conv_self_repetition,
    role_sequence_qa,
    tool_retry_chains,
    transcript_curation_gate,
    turn_boilerplate,
)

_TS = dt.datetime(2026, 1, 1)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit(_TS).cast("timestamp"))


def test_tool_retry_chains_split_and_recovered(spark):
    rows = [
        # conv a / search: err,err,ok -> one chain of 2, recovered
        ("a", 0, "assistant", "LOG lvl=info tool=search latency_ms=1 status=err", "search"),
        ("a", 1, "tool", "LOG lvl=info tool=search latency_ms=1 status=err", "search"),
        ("a", 2, "tool", "LOG lvl=info tool=search latency_ms=1 status=ok", "search"),
        # conv a / calc: ok,err (trailing err, nothing after) -> chain of 1, not recovered
        ("a", 3, "tool", "LOG lvl=info tool=calc latency_ms=1 status=ok", "calc"),
        ("a", 4, "tool", "LOG lvl=info tool=calc latency_ms=1 status=err", "calc"),
        # conv b / search: err,ok,err,err -> chains [1 recovered], [2 not]
        ("b", 0, "tool", "LOG lvl=info tool=search latency_ms=1 status=err", "search"),
        ("b", 1, "tool", "LOG lvl=info tool=search latency_ms=1 status=ok", "search"),
        ("b", 2, "tool", "LOG lvl=info tool=search latency_ms=1 status=err", "search"),
        ("b", 3, "tool", "LOG lvl=info tool=search latency_ms=1 status=err", "search"),
        # non-tool rows never enter
        ("b", 4, "user", "please retry status=err", "none"),
    ]
    out = {
        (r.conv_id, r.tool, r.chain_start): r
        for r in tool_retry_chains(_frame(spark, rows)).collect()
    }
    assert set(out) == {("a", "search", 0), ("a", "calc", 4), ("b", "search", 0), ("b", "search", 2)}
    assert out[("a", "search", 0)].n_failures == 2
    assert out[("a", "search", 0)].chain_end == 1
    assert out[("a", "search", 0)].recovered is True
    assert out[("a", "calc", 4)].recovered is False
    assert out[("b", "search", 0)].n_failures == 1
    assert out[("b", "search", 0)].recovered is True  # the ok at turn 1
    assert out[("b", "search", 2)].n_failures == 2
    assert out[("b", "search", 2)].recovered is False


def test_role_sequence_qa_flags(spark):
    rows = [
        # good: system,user,assistant,tool
        ("g", 0, "system", "s", "none"),
        ("g", 1, "user", "u", "none"),
        ("g", 2, "assistant", "a", "search"),
        ("g", 3, "tool", "t", "search"),
        # bad: opens with tool (orphan + bad_open), double assistant, no... has assistant
        ("b", 0, "tool", "t", "calc"),
        ("b", 1, "assistant", "a", "none"),
        ("b", 2, "assistant", "a", "none"),
        # no assistant at all
        ("n", 0, "user", "u", "none"),
    ]
    out = {r.conv_id: r for r in role_sequence_qa(_frame(spark, rows)).collect()}
    assert out["g"].qa_pass is True and out["g"].n_turns == 4
    b = out["b"]
    assert (b.double_assistant, b.orphan_tool, b.bad_open) == (1, 1, 1)
    assert b.qa_pass is False
    assert out["n"].has_assistant is False and out["n"].qa_pass is False


def test_conv_exact_dedup_groups_identical_conversations(spark):
    rows = [
        ("a", 0, "user", "hi", "none"),
        ("a", 1, "assistant", "hello", "none"),
        ("b", 0, "user", "hi", "none"),
        ("b", 1, "assistant", "hello", "none"),
        ("c", 0, "user", "hi there", "none"),
    ]
    out = {r.conv_id: r for r in conv_exact_dedup(_frame(spark, rows)).collect()}
    assert out["a"].digest == out["b"].digest != out["c"].digest
    assert out["a"].group_size == 2 and out["c"].group_size == 1
    assert out["a"].is_dup is False and out["b"].is_dup is True
    assert out["b"].keeper == "a"


def test_self_repetition_and_boilerplate(spark):
    rows = [
        ("a", 0, "assistant", "let me try again", "none"),
        ("a", 1, "tool", "boom", "calc"),
        ("a", 2, "assistant", "let me try again", "none"),
        ("a", 3, "assistant", "let me try again", "none"),
        ("b", 0, "assistant", "let me try again", "none"),
        ("b", 1, "user", "unique line", "none"),
    ]
    df = _frame(spark, rows)
    rep = conv_self_repetition(df).collect()
    assert len(rep) == 1
    assert (rep[0].conv_id, rep[0].n_repeats, rep[0].first_idx, rep[0].last_idx, rep[0].span) == ("a", 3, 0, 3, 3)

    bp = turn_boilerplate(df).collect()
    assert len(bp) == 1
    assert bp[0].n_occurrences == 4 and bp[0].n_convs == 2


def test_transcript_curation_gate_composes(spark):
    err = "LOG lvl=info tool=search latency_ms=1 status=err"
    rows = [
        # clean conversation -> eligible
        ("a", 0, "user", "hi", "none"),
        ("a", 1, "assistant", "hello", "none"),
        # duplicate of a -> not eligible (is_dup)
        ("b", 0, "user", "hi", "none"),
        ("b", 1, "assistant", "hello", "none"),
        # 3 consecutive failures -> not eligible (chain cap)
        ("c", 0, "user", "go", "none"),
        ("c", 1, "assistant", err, "search"),
        ("c", 2, "tool", err, "search"),
        ("c", 3, "tool", err, "search"),
        # protocol violation (double assistant) -> not eligible
        ("d", 0, "user", "x", "none"),
        ("d", 1, "assistant", "y1", "none"),
        ("d", 2, "assistant", "y2", "none"),
    ]
    out = {r.conv_id: r for r in transcript_curation_gate(_frame(spark, rows)).collect()}
    assert out["a"].eligible is True
    assert out["b"].eligible is False and out["b"].is_dup is True
    c = out["c"]
    assert c.max_chain_failures == 3 and c.has_unrecovered_chain is True
    assert c.eligible is False
    assert out["d"].eligible is False and out["d"].qa_pass is False


def test_incremental_gate_equals_full_recompute_with_group_shift(spark):
    """A touched conversation LEAVES its duplicate group when a new turn
    lands, so the prior dup must become the keeper — the corpus-global
    effect the incremental path must still get right."""
    from opentelemetry_collector_contrib_spark.operators.conv_qa import (
        curation_gate_incremental,
        curation_gate_state,
        transcript_curation_gate,
    )

    old_rows = [
        # a and b identical -> a keeper, b dup
        ("a", 0, "user", "hi", "none"),
        ("a", 1, "assistant", "hello", "none"),
        ("b", 0, "user", "hi", "none"),
        ("b", 1, "assistant", "hello", "none"),
        # untouched singleton
        ("z", 0, "user", "zzz", "none"),
        ("z", 1, "assistant", "ok", "none"),
    ]
    delta_rows = [("a", 2, "user", "more", "none")]  # a diverges from b
    old = _frame(spark, old_rows)
    delta = _frame(spark, delta_rows)
    base = old.unionByName(delta)

    prior = curation_gate_state(old)
    _, verdicts = curation_gate_incremental(base, delta, prior)
    got = {r.conv_id: r.asDict() for r in verdicts.collect()}
    want = {r.conv_id: r.asDict() for r in transcript_curation_gate(base).collect()}
    assert got == want
    assert got["b"]["is_dup"] is False  # b is now its group's only member
    assert got["a"]["is_dup"] is False and got["a"]["n_turns"] == 3


def test_pack_conversations_invariants(spark, t1):
    """No pack exceeds budget unless it holds a single oversize
    conversation; packs are contiguous per shard; every conv packed once."""
    from opentelemetry_collector_contrib_spark.operators.curation import (
        pack_conversations,
    )

    budget = 500
    out = pack_conversations(t1, budget=budget).collect()
    assert len(out) == t1.select("conv_id").distinct().count()
    by_pack = {}
    for r in out:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r)
    for (shard, pid), rows in by_pack.items():
        total = sum(r.n_tokens for r in rows)
        if total > budget:
            # only legal when a single oversize conversation owns the pack
            assert len(rows) == 1 and rows[0].oversize, (shard, pid, total)
        assert sorted(r.pack_pos for r in rows) == list(range(len(rows)))
        assert max(r.fill for r in rows) == total
    # contiguity: pack ids per shard are 0..max with no gaps
    for shard in {r.shard for r in out}:
        pids = sorted({r.pack_id for r in out if r.shard == shard})
        assert pids == list(range(len(pids)))


def test_pack_conversations_never_splits_and_is_deterministic(spark, t1):
    from opentelemetry_collector_contrib_spark.operators.curation import (
        pack_conversations,
    )

    a = {r.conv_id: (r.shard, r.pack_id, r.pack_pos) for r in pack_conversations(t1, budget=500).collect()}
    b = {r.conv_id: (r.shard, r.pack_id, r.pack_pos) for r in pack_conversations(t1.orderBy(F.rand(7)), budget=500).collect()}
    assert a == b  # layout depends only on (shard, conv_id), not input order


def test_rl_transitions_rewards_steps_done(spark):
    from opentelemetry_collector_contrib_spark.operators.conv_qa import rl_transitions

    ok = "LOG lvl=info tool=search latency_ms=1 status=ok"
    err = "LOG lvl=info tool=calc latency_ms=1 status=err"
    rows = [
        ("a", 0, "user", "find it", "none"),
        ("a", 1, "assistant", ok, "search"),
        ("a", 2, "tool", err, "calc"),
        ("a", 3, "assistant", "done", "none"),
        ("b", 0, "user", "x", "none"),
    ]
    out = {r.step: r for r in rl_transitions(_frame(spark, rows)).collect()}
    assert len(out) == 2  # only tool-status turns become transitions
    assert out[1].action == "search" and out[1].reward == 1.0 and out[1].done is False
    assert out[2].action == "calc" and out[2].reward == -1.0 and out[2].done is True
    # state digest = md5 of the PREVIOUS turn's text
    import hashlib

    assert out[1].state_digest == hashlib.md5(b"find it").hexdigest()
