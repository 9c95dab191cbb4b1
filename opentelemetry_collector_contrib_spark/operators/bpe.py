"""Distributed BPE merge training (byte-pair encoding vocabulary induction).

A tokenizer-training pipeline need beyond the reference's telemetry
operators (public method: Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"). Classic BPE trains on the WORD-FREQUENCY
dictionary, not the raw corpus: dedup words first (one hash aggregation —
at 10^12 tokens the distinct-word dict is ~10^8 rows), then per merge round
count adjacent symbol pairs weighted by word frequency, pick the most
frequent pair (ties → lexicographically smallest), and rewrite every word.

Engine-portable representation: a word is a leading delimiter plus each
symbol followed by a DOUBLE delimiter (`.a..b..c..` for d = \\x1f), and
applying merge (a,b) is ONE `replace(s, d+a+dd+b+d, d+ab+d)`. replace() in
Spark, DuckDB, and Python substitutes non-overlapping matches left-to-right;
with the doubled separators two adjacent pair-occurrences share no
characters (each match consumes only the FIRST of the two dots that follow
its second token), so replace-all IS the canonical greedy left-to-right
sweep — a hypothesis property test cross-checks it against a reference
sweep, including odd repeat runs like `aaaaa` where the naive
single-delimiter encoding mispairs. This makes every round — pair counting,
argmax, rewrite — expressible identically in SQL, so even this iterative
algorithm gets a full DuckDB oracle (k rounds unrolled).

Scale design (round-4 rewrite): the word-frequency dict is ONE distributed
hash aggregation collected ONCE to the driver (~10^8 rows at 10^12 tokens —
the same bounded-collect contract as the k-means centroid trainer; cap with
``max_words`` to keep it strictly bounded), then the k-merge loop runs
in-memory with incremental pair-count updates (only words containing the
merged pair are touched per round — the classic tokenizer-trainer shape).
The previous design scheduled one explode+groupBy+collect Spark job PER
merge; at a real 30k-merge vocabulary that is 30k scheduled jobs against a
dict that fits on the driver. ``bpe_apply`` stays a pure codegen projection.
The driver's greedy left-to-right merge sweep is exactly the replace-all
semantics above, so the unrolled SQL oracle is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

DELIM = "\x1f"


def _delimited(word_col):
    """word → d + c1 + dd + c2 + dd + … (initial symbols = characters;
    doubled separators, so pair matches can never share characters)."""
    return F.concat(F.lit(DELIM), F.regexp_replace(word_col, "(.)", "$1" + DELIM + DELIM))


def _apply_merge(sym_col, a: str, b: str):
    """Merge (a,b) → ab: one replace == the greedy left-to-right sweep."""
    pat = F.lit(DELIM + a + DELIM + DELIM + b + DELIM)
    rep = F.lit(DELIM + a + b + DELIM)
    return F.replace(sym_col, pat, rep)


def _pairs(sym_col):
    """Adjacent symbol pairs (non-distinct) as 'a<d>b' strings."""
    toks = F.filter(F.split(sym_col, DELIM), lambda t: t != "")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, F.lit(1), n1),
        F.slice(toks, F.lit(2), n1),
        lambda x, y: F.concat(x, F.lit(DELIM), y),
    )


def word_dict(df: DataFrame, text_col: str = "text", lowercase: bool = True) -> DataFrame:
    """Distinct-word frequency dictionary with the delimited symbol column."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = df.select(F.explode(tokens(t)).alias("raw"))
    # the delimiter byte must never appear inside a token
    words = words.select(F.replace(F.col("raw"), F.lit(DELIM), F.lit("")).alias("word"))
    wd = words.filter(F.col("word") != "").groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    return wd.withColumn("syms", _delimited(F.col("word")))


def bpe_train(
    df: DataFrame,
    k_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int | None = 1_000_000,
) -> list[dict]:
    """Learn `k_merges` BPE merges; returns [{rank, left, right, merged,
    pair_count}, …] in learned order. Stops early if no pair remains.

    One distributed word-frequency aggregation, collected once; the merge
    loop is driver-side with incremental pair-count maintenance (each
    round touches only the words that contain the winning pair). Argmax
    ties break on the lexicographically smallest ``left+DELIM+right``
    string — Spark/DuckDB binary string order == Python code-point order
    for valid UTF-8, so the unrolled SQL oracle agrees bit-for-bit.
    ``max_words`` bounds the driver collect (top-N by frequency, ties by
    word — a deterministic TakeOrdered, same contract as the k-means
    centroid sampler). It DEFAULTS to 1e6 so the collect is bounded by
    contract, not caller discipline: a web-scale corpus has ~1e8 distinct
    words (Heaps' law at 1e12 tokens) and an unbounded collect is a
    driver OOM; merges learned from the top-1e6 words by frequency are
    statistically indistinguishable for any realistic ``k_merges`` (rare
    tail words cannot win a pair-count argmax). Pass ``max_words=None``
    explicitly to collect the full dictionary (small-corpus exactness,
    e.g. the DuckDB parity oracle)."""
    wd = word_dict(df, text_col, lowercase).select("word", "freq")
    if max_words is not None:
        wd = wd.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(max_words)
    words: list[tuple[list[str], int]] = [
        (list(r["word"]), r["freq"]) for r in wd.collect()
    ]

    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (syms, freq) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            pair_words[p].add(idx)

    merges: list[dict] = []
    for rank in range(k_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0] + DELIM + kv[0][1])
        )
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "pair_count": cnt}
        )
        merged = a + b
        # rewrite only the words containing (a,b); pair_words may hold stale
        # indices (words rewritten since insertion) — the symmetric
        # subtract-old/add-new update is a no-op for those, so they're safe
        for idx in sorted(pair_words.pop((a, b), ())):
            syms, freq = words[idx]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= freq
            out: list[str] = []
            i = 0
            # greedy non-overlapping left-to-right sweep == replace-all
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = (out, freq)
            for p in zip(out, out[1:]):
                pair_counts[p] += freq
                pair_words[p].add(idx)
        for p in [p for p, c in pair_counts.items() if c <= 0]:
            del pair_counts[p]
            pair_words.pop(p, None)
    return merges


def bpe_merges_df(
    df: DataFrame, k_merges: int, text_col: str = "text",
    max_words: int | None = None,
) -> DataFrame:
    """bpe_train as a DataFrame (rank, left, right, merged, pair_count).
    Defaults to max_words=None (FULL dictionary) because this form backs
    the exact DuckDB parity oracle, which folds every word — callers at
    corpus scale should pass a bound like bpe_train's default."""
    spark = df.sparkSession
    merges = bpe_train(df, k_merges, text_col, max_words=max_words)
    schema = "rank int, left string, right string, merged string, pair_count bigint"
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges],
        schema,
    )


def bpe_apply(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize text with a learned merge list: per word, apply every merge
    in rank order (the double-replace chain compiles into ONE codegen
    projection — no UDF, scan-speed), then emit the flattened subword
    sequence."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)

    def encode_word(w):
        s = _delimited(F.replace(w, F.lit(DELIM), F.lit("")))
        for m in merges:
            s = _apply_merge(s, m["left"], m["right"])
        return F.filter(F.split(s, DELIM), lambda x: x != "")

    words = tokens(t)
    return df.withColumn(out_col, F.flatten(F.transform(words, encode_word)))
