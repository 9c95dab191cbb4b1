"""Agent-transcript QA operators: conversation-level quality gates for
curating multi-turn transcripts before they become training data.

The reference curates logs record-at-a-time (filterprocessor drop rules,
logdedupprocessor suppression — processor/filterprocessor,
processor/logdedupprocessor); a transcript corpus needs the analogous
gates at *conversation* granularity: did the tool loop fail repeatedly,
does the role sequence make sense, is the whole conversation a duplicate
of another, is the agent stuck repeating itself. Each operator here is a
one-or-two-shuffle DataFrame plan keyed on ``conv_id`` (or on the dedup
digest), the same partitioning the pipeline's stable-order window
already establishes — at 10^12 turns these reuse that exchange rather
than adding new ones.

Scale notes
-----------
* ``tool_retry_chains`` — one exchange on ``(conv_id, tool)`` for the
  gaps-and-islands window (change-flag + running sum, NOT a second
  row_number window spec, so Catalyst plans a single Sort), then a hash
  aggregate on the island key. Tool-status rows are filtered before the
  shuffle, so the exchange carries only the tool-call subset.
* ``role_sequence_qa`` — one window pass + one hash aggregate, both on
  ``conv_id``; AQE coalesces the tiny per-conv output.
* ``conv_exact_dedup`` — per-turn md5 first (32 bytes/turn regardless of
  text size), then one ordered fold per conversation; the digest window
  shuffles 32-byte keys, never text. State per group is bounded by the
  per-conversation turn cap, not corpus size.
* ``conv_self_repetition`` / ``turn_boilerplate`` — plain hash
  aggregates with map-side combine; boilerplate shuffles md5(text), not
  the text itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STATUS_RE = r"status=(\w+)"


def _status(col: Column, pattern: str = STATUS_RE) -> Column:
    return F.regexp_extract(col, pattern, 1)


def tool_retry_chains(df: DataFrame, status_pattern: str = STATUS_RE) -> DataFrame:
    """Consecutive-failure runs per (conversation, tool).

    A "chain" is a maximal run of same-tool turns whose extracted status
    is ``err`` (gaps-and-islands over the stable turn order). For each
    chain: where it started/ended, how many consecutive failures, and
    whether the *next* same-tool call after the run succeeded
    (``recovered``) — the retry-exhaustion signal a curation pass drops
    or down-weights. Mirrors the spirit of the reference's error-route
    predicates (routingconnector on severity) lifted to run-level.
    """
    t = df.select(
        "conv_id",
        "tool",
        "turn_idx",
        _status(F.col("text"), status_pattern).alias("status"),
    ).filter((F.col("tool") != "none") & (F.col("status") != ""))

    w = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("status").over(w)
    chg = (prev.isNull() | (F.col("status") != prev)).cast("int")
    t = t.select(
        "conv_id",
        "tool",
        "turn_idx",
        "status",
        F.sum(chg).over(wc).alias("island"),
        F.lead("status").over(w).alias("next_status"),
    )
    return (
        t.filter(F.col("status") == "err")
        .groupBy("conv_id", "tool", "island")
        .agg(
            F.min("turn_idx").alias("chain_start"),
            F.max("turn_idx").alias("chain_end"),
            F.count(F.lit(1)).alias("n_failures"),
            F.coalesce(
                F.max_by("next_status", "turn_idx") == F.lit("ok"), F.lit(False)
            ).alias("recovered"),
        )
        .select(
            "conv_id", "tool", "chain_start", "chain_end", "n_failures", "recovered"
        )
    )


def role_sequence_qa(df: DataFrame) -> DataFrame:
    """Per-conversation role-protocol validation.

    Flags, per turn, the three transitions a well-formed agent
    transcript never contains — two assistant turns in a row, a tool
    result not preceded by an assistant call (or another tool result),
    and an opening turn that is neither system nor user — then
    aggregates counts per conversation with an overall ``qa_pass``
    verdict (all counts zero and at least one assistant turn present).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    t = df.select(
        "conv_id",
        "role",
        ((F.col("role") == "assistant") & (prev == "assistant"))
        .alias("f_double_assistant"),
        (
            (F.col("role") == "tool")
            & (prev.isNull() | ~prev.isin("assistant", "tool"))
        ).alias("f_orphan_tool"),
        ((F.col("turn_idx") == 0) & ~F.col("role").isin("system", "user")).alias(
            "f_bad_open"
        ),
    )
    agg = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("f_double_assistant").cast("int")).cast("bigint").alias(
            "double_assistant"
        ),
        F.sum(F.col("f_orphan_tool").cast("int")).cast("bigint").alias("orphan_tool"),
        F.sum(F.col("f_bad_open").cast("int")).cast("bigint").alias("bad_open"),
        F.max(F.col("role") == "assistant").alias("has_assistant"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "double_assistant",
        "orphan_tool",
        "bad_open",
        "has_assistant",
        (
            (F.col("double_assistant") == 0)
            & (F.col("orphan_tool") == 0)
            & (F.col("bad_open") == 0)
            & F.col("has_assistant")
        ).alias("qa_pass"),
    )


def conv_exact_dedup(df: DataFrame) -> DataFrame:
    """Conversation-level exact dedup digest + duplicate-group stats.

    Digest = md5 over the turn-ordered concatenation of per-turn
    md5(role | text) hashes — 32 bytes of state per turn regardless of
    text length, so the fold and the digest shuffle stay bounded at
    10^12 turns. Every conversation is emitted (digest is also the
    cache/versioning key); ``is_dup`` marks the non-keeper members of
    each >1 group, keeper = lexicographically-first conv_id.
    """
    s = F.md5(
        F.concat(
            F.coalesce(F.col("role"), F.lit("")),
            F.lit("|"),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    g = (
        df.select("conv_id", "turn_idx", s.alias("h"))
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(F.struct("turn_idx", "h"))).alias("hs"))
        .select(
            "conv_id",
            F.md5(
                F.concat_ws("", F.transform(F.col("hs"), lambda x: x["h"]))
            ).alias("digest"),
        )
    )
    wd = Window.partitionBy("digest")
    return g.select(
        "conv_id",
        "digest",
        F.count(F.lit(1)).over(wd).alias("group_size"),
        F.min("conv_id").over(wd).alias("keeper"),
    ).withColumn("is_dup", F.col("conv_id") != F.col("keeper"))


def conv_self_repetition(df: DataFrame) -> DataFrame:
    """Within-conversation repeated turn text — the agent-loop detector.

    A turn whose exact text recurs later in the same conversation is the
    classic stuck-agent signature; emit one row per (conv, repeated
    text) with the repeat count and the index span the loop covers.
    """
    return (
        df.groupBy("conv_id", "text")
        .agg(
            F.count(F.lit(1)).alias("n_repeats"),
            F.min("turn_idx").alias("first_idx"),
            F.max("turn_idx").alias("last_idx"),
        )
        .filter(F.col("n_repeats") > 1)
        .select(
            "conv_id",
            F.md5("text").alias("text_digest"),
            "n_repeats",
            "first_idx",
            "last_idx",
            (F.col("last_idx") - F.col("first_idx")).alias("span"),
        )
    )


def curation_gate_state(df: DataFrame) -> DataFrame:
    """Per-conversation component state for the curation gate — every
    column that can be computed from ONE conversation's own turns (role
    QA, content digest, retry-chain extremes). The corpus-global parts
    (duplicate grouping, the final verdict) live in
    ``curation_gate_from_state`` so state rows can be carried forward
    unchanged for conversations an append batch never touched.
    """
    qa = role_sequence_qa(df).select("conv_id", "n_turns", "qa_pass")
    s = F.md5(
        F.concat(
            F.coalesce(F.col("role"), F.lit("")),
            F.lit("|"),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    dg = (
        df.select("conv_id", "turn_idx", s.alias("h"))
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(F.struct("turn_idx", "h"))).alias("hs"))
        .select(
            "conv_id",
            F.md5(
                F.concat_ws("", F.transform(F.col("hs"), lambda x: x["h"]))
            ).alias("digest"),
        )
    )
    ch = (
        tool_retry_chains(df)
        .groupBy("conv_id")
        .agg(
            F.max("n_failures").alias("max_chain_failures"),
            F.max((~F.col("recovered")).cast("int")).cast("boolean").alias(
                "has_unrecovered_chain"
            ),
        )
    )
    return (
        qa.join(dg, "conv_id", "left")
        .join(ch, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            "qa_pass",
            "digest",
            F.coalesce(F.col("max_chain_failures"), F.lit(0)).alias(
                "max_chain_failures"
            ),
            F.coalesce(F.col("has_unrecovered_chain"), F.lit(False)).alias(
                "has_unrecovered_chain"
            ),
        )
    )


def curation_gate_from_state(
    state: DataFrame, max_consecutive_failures: int = 3
) -> DataFrame:
    """Assemble the verdict table from per-conversation state: the
    duplicate-group window over digests (the only corpus-global step —
    one row per CONVERSATION, 32-byte keys) plus the eligibility
    conjunction."""
    wd = Window.partitionBy("digest")
    return state.select(
        "conv_id",
        "n_turns",
        "qa_pass",
        (F.col("conv_id") != F.min("conv_id").over(wd)).alias("is_dup"),
        "max_chain_failures",
        "has_unrecovered_chain",
    ).withColumn(
        "eligible",
        F.col("qa_pass")
        & ~F.col("is_dup")
        & (F.col("max_chain_failures") < max_consecutive_failures),
    )


def transcript_curation_gate(
    df: DataFrame, max_consecutive_failures: int = 3
) -> DataFrame:
    """Composite per-conversation curation verdict — the transcript
    analogue of the document-side ``curation_e2e`` pipeline.

    Joins the three QA surfaces (role protocol, conversation-exact
    dedup, tool-retry chains) into one row per conversation with every
    gate's evidence plus the final ``eligible`` flag: protocol-clean,
    not a duplicate (keeper survives), and no failure chain at or above
    ``max_consecutive_failures``. All three inputs are per-conversation
    frames keyed on ``conv_id``, so the joins shuffle conv-count rows,
    not turns; at 10^12 turns the verdict table is ~10^8 rows.
    """
    return curation_gate_from_state(
        curation_gate_state(df), max_consecutive_failures
    )


def curation_gate_incremental(
    base: DataFrame,
    delta: DataFrame,
    prior_state: DataFrame,
    max_consecutive_failures: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Append-batch refresh: recompute state ONLY for conversations the
    delta touches; carry every other conversation's state forward.

    ``base`` is the full table AFTER the append (old rows + delta),
    ``delta`` the appended turns, ``prior_state`` the
    ``curation_gate_state`` output from before the append. Returns
    ``(new_state, verdicts)`` where verdicts equals a full
    ``transcript_curation_gate(base)`` recompute exactly (pytest +
    oracle gated) — including duplicate-group shifts caused by touched
    conversations entering or leaving digest groups, because the
    dedup window runs over the complete (carried + recomputed) state.

    Per-append cost: per-turn work is O(turns of touched conversations)
    (one semi-join against base, partition-pruned under the bucketed
    layout); the global window touches one 32-byte row per conversation,
    never raw turns.
    """
    touched = delta.select("conv_id").distinct()
    recomputed = curation_gate_state(base.join(touched, "conv_id", "left_semi"))
    carried = prior_state.join(touched, "conv_id", "left_anti")
    new_state = carried.unionByName(recomputed)
    return new_state, curation_gate_from_state(new_state, max_consecutive_failures)


def turn_boilerplate(df: DataFrame, min_occurrences: int = 2) -> DataFrame:
    """Cross-conversation repeated turn text (boilerplate detector).

    Turn texts that recur across many conversations are templated
    boilerplate (canned greetings, fixed tool banners) that a training
    pipeline down-weights; shuffles md5(text) rather than the text.
    """
    return (
        df.select(F.md5("text").alias("text_digest"), "conv_id")
        .groupBy("text_digest")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .filter(
            (F.col("n_occurrences") >= min_occurrences) & (F.col("n_convs") > 1)
        )
    )


def rl_transitions(df: DataFrame, status_pattern: str = STATUS_RE) -> DataFrame:
    """Agent-RL transition tuples from transcripts: one row per tool
    call with (step index, action, reward, done) — the trajectory
    extraction an RL-on-agent-traces pipeline runs before advantage
    estimation. Reward is the tool outcome (+1 ok / -1 err), ``done``
    marks the conversation's final tool call, and ``state_digest`` is a
    bounded stand-in for the observation: the md5 of the PREVIOUS turn's
    text (the context the policy saw), 32 bytes regardless of turn size.

    One exchange on conv_id (shared stable order), two window passes.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = df.select(
        "conv_id",
        "turn_idx",
        "tool",
        _status(F.col("text"), status_pattern).alias("status"),
        F.md5(F.coalesce(F.lag("text").over(w), F.lit(""))).alias("state_digest"),
    ).filter((F.col("tool") != "none") & (F.col("status") != ""))
    wt = Window.partitionBy("conv_id").orderBy("turn_idx")
    return t.select(
        "conv_id",
        F.row_number().over(wt).alias("step"),
        "turn_idx",
        F.col("tool").alias("action"),
        F.when(F.col("status") == "ok", 1.0).otherwise(-1.0).alias("reward"),
        (F.lead("turn_idx").over(wt).isNull()).alias("done"),
        "state_digest",
    )
