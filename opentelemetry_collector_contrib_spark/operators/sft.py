"""Transcript → training-example extraction (SFT / chat-tuning shapes).

The transcripts table (conv_id, turn_idx, role, text, tool, ts — the
input-hint schema) is exactly the raw material of a supervised
fine-tuning pipeline, and the operators here close the last gap between
"telemetry pipeline over transcripts" and "training-data pipeline over
transcripts": rendering turns with a deterministic chat template,
cutting one (prompt, completion) example per assistant turn with a
bounded context window, and building per-conversation packed sequences
with character-span loss masks for the trainable (assistant) regions.

There is no reference analogue — the collector stops at routing and
aggregation — so these extend the engine the same way the dedup/ANN
family does; they are first-class, oracle-gated operators.

Scale shape (10^12 turns):
  - `render_turn` is a concat projection — scan speed, codegen.
  - `sft_examples` pays the ONE conv_id shuffle every per-conv operator
    shares (operators/order.py note), then a BOUNDED window frame
    (`ROWS BETWEEN max_context_turns PRECEDING AND 1 PRECEDING`): work
    and memory per row are O(max_context_turns · avg_turn_chars),
    independent of conversation length — an unbounded frame would make
    monster conversations quadratic in output bytes, which is why the
    context cap is a required argument and not an optional nicety (it
    is also what the training job wants: context beyond the model's
    window is dead weight).
  - `conversation_masked_sequence` is the same single shuffle: one
    cumulative-length window (running char offset) + one groupBy over
    the identical partitioning — Catalyst reuses the Exchange. Mask
    spans are computed positionally from the running sum, never by
    re-searching the sequence (substring search would be O(n²) per
    conversation and wrong on repeated turns).

Both operators emit deterministic, engine-portable columns (bigint char
offsets, whitespace token counts identical to textstats.tokens) so the
DuckDB golden oracle checks the full construction — template bytes,
frame bounds, mask offsets — not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens

#: Template control tokens. Kept ASCII and collision-free with the
#: fixture corpus; a real tokenizer maps them to dedicated ids.
TURN_OPEN = "<|"
TURN_CLOSE = "|>\n"
TURN_END = "<|end|>\n"


def render_turn(role: Column, text: Column) -> Column:
    """One turn rendered with the chat template:
    ``<|{role}|>\\n{text}\\n<|end|>\\n`` — a pure concat projection.
    NULL role/text render as empty rather than nulling the whole turn,
    so a malformed turn cannot silently vanish from the sequence (and
    the bounded-context frame count stays equal to the row count)."""
    return F.concat(
        F.lit(TURN_OPEN),
        F.coalesce(role, F.lit("")),
        F.lit(TURN_CLOSE),
        F.coalesce(text, F.lit("")),
        F.lit("\n"),
        F.lit(TURN_END),
    )


def sft_examples(
    df: DataFrame,
    max_context_turns: int = 8,
    min_context_turns: int = 1,
    assistant_role: str = "assistant",
    max_prompt_chars: int | None = None,
) -> DataFrame:
    """One supervised training example per assistant turn: the prompt is
    the chat-template render of (up to) the `max_context_turns` turns
    immediately preceding it in stable order, the completion is the
    assistant turn's raw text.

    Window frame = ``ROWS BETWEEN max_context_turns PRECEDING AND
    1 PRECEDING`` over (conv_id ORDER BY turn_idx, ts) — the north-rule
    stable ordering, so the same conversation always yields
    byte-identical examples. Assistant turns with fewer than
    `min_context_turns` preceding turns are dropped (an assistant turn
    opening a conversation has nothing to condition on).

    `max_prompt_chars` truncates the prompt from the LEFT (oldest
    context falls off first — the training job keeps the tokens nearest
    the completion), matching how a rolling context window behaves.

    Output: conv_id, turn_idx, n_context_turns, prompt, completion,
    prompt_chars, completion_tokens.
    """
    if max_context_turns < 1:
        raise ValueError("max_context_turns must be >= 1")
    order = [F.col("turn_idx").asc(), F.col("ts").asc()]
    frame = (
        Window.partitionBy("conv_id")
        .orderBy(*order)
        .rowsBetween(-max_context_turns, -1)
    )
    rendered = render_turn(F.col("role"), F.col("text"))
    staged = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "ts",
        F.collect_list(rendered).over(frame).alias("_ctx"),
    )
    prompt = F.array_join(F.col("_ctx"), "")
    if max_prompt_chars is not None:
        # keep the RIGHTMOST max_prompt_chars (most recent context)
        plen = F.length(prompt)
        prompt = F.substring(
            prompt,
            F.greatest(plen - F.lit(max_prompt_chars) + 1, F.lit(1)),
            F.lit(max_prompt_chars),
        )
    out = staged.where(
        (F.col("role") == assistant_role)
        & (F.size("_ctx") >= min_context_turns)
    ).select(
        "conv_id",
        "turn_idx",
        F.size("_ctx").cast("bigint").alias("n_context_turns"),
        prompt.alias("prompt"),
        F.col("text").alias("completion"),
        F.length(prompt).cast("bigint").alias("prompt_chars"),
        F.size(tokens(F.coalesce(F.col("text"), F.lit(""))))
        .cast("bigint")
        .alias("completion_tokens"),
    )
    return out


def preference_pairs(
    df: DataFrame,
    key_col: str = "prompt_key",
    completion_col: str = "completion",
    score_col: str = "score",
    require_margin: bool = True,
) -> DataFrame:
    """Preference-pair (DPO/RLHF-style) construction: for every prompt
    key with at least two distinct completions, emit one (chosen,
    rejected) pair — chosen is the score-maximal completion, rejected
    the score-minimal one, ties broken by the completion bytes so the
    pick is total and deterministic.

    The grouping key and the score are deliberately pluggable columns:
    real pipelines group by a semantic prompt cluster and score with a
    reward model (mounted exactly like the textstats BatchModel hook);
    the registry exercise uses a prefix-normalized prompt key and a
    verbosity-baseline score. `require_margin=True` drops pairs whose
    chosen and rejected scores tie — a zero-margin pair carries no
    preference signal and only adds label noise.

    Scale shape: ONE hash aggregation on the prompt key (min/max of a
    (score, completion) struct + distinct count — partial map-side
    combine applies), no window sort, no self-join; output is one row
    per key, so the result is strictly smaller than the input.

    Output: <key_col>, chosen, rejected, score_chosen, score_rejected,
    margin, n_candidates.
    """
    s = F.col(score_col).cast("double")
    cand = F.struct(s.alias("s"), F.col(completion_col).alias("c"))
    agg = df.groupBy(key_col).agg(
        F.max(cand).alias("_hi"),
        F.min(cand).alias("_lo"),
        F.countDistinct(completion_col).alias("n_candidates"),
    )
    out = agg.where(F.col("_hi.c") != F.col("_lo.c"))
    if require_margin:
        out = out.where(F.col("_hi.s") > F.col("_lo.s"))
    return out.select(
        key_col,
        F.col("_hi.c").alias("chosen"),
        F.col("_lo.c").alias("rejected"),
        F.col("_hi.s").alias("score_chosen"),
        F.col("_lo.s").alias("score_rejected"),
        (F.col("_hi.s") - F.col("_lo.s")).alias("margin"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
    )


def conversation_masked_sequence(
    df: DataFrame,
    trainable_role: str = "assistant",
) -> DataFrame:
    """One packed row per conversation: the full chat-template render of
    every turn in stable order, plus the character-span loss mask of the
    trainable (assistant) regions.

    Offsets come from a running sum of rendered-turn lengths (exclusive
    prefix sum), so span `start-end` (0-based, end-exclusive) addresses
    the WHOLE rendered turn — template tokens included, the convention
    when the template tokens themselves are trained. The sequence is
    returned as its md5 (`seq_md5`) rather than raw bytes: the hash
    pins every byte of the construction while keeping the result row
    narrow enough to compare at any scale.

    Output: conv_id, n_turns, n_chars, seq_md5, mask_csv (``s-e;s-e``
    over trainable spans in order, NULL when the conversation has no
    trainable turn), trainable_chars, trainable_frac.
    """
    order = [F.col("turn_idx").asc(), F.col("ts").asc()]
    w_prev = (
        Window.partitionBy("conv_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_rn = Window.partitionBy("conv_id").orderBy(*order)
    rendered = render_turn(F.col("role"), F.col("text"))
    staged = df.select(
        "conv_id",
        "role",
        F.row_number().over(w_rn).alias("_rn"),
        rendered.alias("_r"),
        F.length(rendered).cast("bigint").alias("_len"),
        F.coalesce(F.sum(F.length(rendered).cast("bigint")).over(w_prev), F.lit(0).cast("bigint")).alias("_start"),
    )
    is_train = F.col("role") == trainable_role
    span = F.concat_ws("-", F.col("_start"), (F.col("_start") + F.col("_len")))
    agg = staged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_len").alias("n_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_rn"), F.col("_r").alias("r")))),
                    lambda x: x["r"],
                ),
                "",
            )
        ).alias("seq_md5"),
        F.nullif(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(is_train, F.struct(F.col("_rn"), span.alias("s")))
                        )
                    ),
                    lambda x: x["s"],
                ),
                ";",
            ),
            F.lit(""),
        ).alias("mask_csv"),
        F.sum(F.when(is_train, F.col("_len")).otherwise(F.lit(0))).alias("trainable_chars"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_chars",
        "seq_md5",
        "mask_csv",
        "trainable_chars",
        F.round(F.col("trainable_chars") / F.col("n_chars"), 6).alias("trainable_frac"),
    )
