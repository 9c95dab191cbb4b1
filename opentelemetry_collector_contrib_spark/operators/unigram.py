"""Distributed unigram-LM tokenizer training (SentencePiece-style EM).

The second tokenizer family next to `bpe.py` (public method: Kudo 2018,
"Subword Regularization" — the unigram language model behind
SentencePiece): instead of greedy merges, hold a piece vocabulary with
probabilities, and train by EM over the lattice of ALL segmentations of
each word. Like BPE, training runs on the WORD-FREQUENCY dictionary —
one hash aggregation turns 10^12 corpus tokens into ~10^8 distinct words
— so every EM pass is O(distinct words × word_len² × avg piece matches),
independent of corpus size.

Columnar/Spark decomposition per EM iteration:
  E-step — per distinct word, forward-backward over the segmentation
    lattice accumulates each piece's expected count (posterior mass of
    segmentations using it). The DP is inherently sequential per word →
    an Arrow-batched pandas UDF (the honest-UDF case, same family as
    octet framing / msgpack): vocab probs broadcast once per executor,
    output one (piece, expected_count × word_freq) array per word,
    exploded.
  M-step — ONE hash aggregation: new prob_p = Σ exp_count_p / Σ total.
  Prune — keep the top `vocab_size` pieces by probability (single-char
    pieces are never pruned — coverage must stay total). This is the
    standard simplification of SentencePiece's likelihood-drop pruning
    (it prunes by per-piece loss; top-prob keeps the same head of the
    distribution in practice and stays engine-deterministic); documented
    as such, not claimed identical.

Determinism: seed vocab and all ties order by (value desc, piece asc);
EM math is float64 with per-word sequential fold order fixed by position,
and the M-step sums are grouped per piece (Spark partial-agg float
addition — associativity drift is below the 1e-9 pruning margins on the
scales tested; the tests assert piece SETS and probability bounds, not
exact float identity across cluster layouts).

Tokenization (`unigram_tokenize`) is per-word Viterbi with the broadcast
vocab — same honest-UDF shape — emitting the max-probability
segmentation; unknown characters fall back to a per-char piece with a
floor probability (SentencePiece's unk handling, simplified).

No SQL oracle: the lattice DP is not reasonably expressible in DuckDB
(same gating as the HLL/DDSketch state and the exponential-histogram
kernel) — gated by pytest invariants instead: round-trip losslessness,
probability normalization, EM likelihood monotonicity on the dictionary,
convergence to the planted pieces on a toy corpus, determinism.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textstats import tokens

_MAX_PIECE_LEN = 8
_UNK_LOG_FLOOR = -20.0


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) dictionary — the one corpus-sized aggregation."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def seed_vocab(
    words: DataFrame, seed_size: int, max_piece_len: int = _MAX_PIECE_LEN
) -> DataFrame:
    """Initial candidate pieces: all within-word substrings up to
    ``max_piece_len`` scored by freq-weighted occurrence count, top
    ``seed_size`` kept (ties → piece asc) — plus EVERY single character
    unconditionally (total coverage). The substring explode is bounded:
    len × max_piece_len entries per word, over the distinct-word dict,
    not the corpus. Output: (piece, n) candidate weights."""
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(word)), i ->
              transform(sequence(i, least(length(word), i + {max_piece_len - 1})), j ->
                substring(word, i, j - i + 1))))"""
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), F.col("freq"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def _estep_udf(vocab: dict[str, float], max_len: int):
    """Forward-backward expected piece counts per word, as a pandas UDF
    returning an array of (piece, weight) structs. log-domain with
    logsumexp; positions without any piece cover fall back to the unk
    char floor so every word keeps nonzero total probability."""
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("piece", T.StringType()),
                T.StructField("w", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def estep(words: pd.Series) -> pd.Series:
        def lse(a: float, b: float) -> float:
            if a == -math.inf:
                return b
            if b == -math.inf:
                return a
            m = a if a > b else b
            return m + math.log(math.exp(a - m) + math.exp(b - m))

        def run(word: str):
            n = len(word)
            if n == 0:
                return []
            # arcs[i] = list of (j, piece, logp) for pieces word[i:j]
            arcs = [[] for _ in range(n)]
            for i in range(n):
                hi = min(n, i + max_len)
                for j in range(i + 1, hi + 1):
                    p = word[i:j]
                    lp = vocab.get(p)
                    if lp is not None:
                        arcs[i].append((j, p, lp))
                if not arcs[i]:  # unk char keeps the lattice connected
                    arcs[i].append((i + 1, word[i : i + 1], _UNK_LOG_FLOOR))
            fwd = [-math.inf] * (n + 1)
            fwd[0] = 0.0
            for i in range(n):
                if fwd[i] == -math.inf:
                    continue
                for j, _p, lp in arcs[i]:
                    fwd[j] = lse(fwd[j], fwd[i] + lp)
            bwd = [-math.inf] * (n + 1)
            bwd[n] = 0.0
            for i in range(n - 1, -1, -1):
                for j, _p, lp in arcs[i]:
                    if bwd[j] != -math.inf:
                        bwd[i] = lse(bwd[i], lp + bwd[j])
            total = fwd[n]
            if total == -math.inf:
                return []
            acc: dict[str, float] = {}
            for i in range(n):
                if fwd[i] == -math.inf:
                    continue
                for j, p, lp in arcs[i]:
                    if bwd[j] == -math.inf:
                        continue
                    post = math.exp(fwd[i] + lp + bwd[j] - total)
                    if post > 0.0:
                        acc[p] = acc.get(p, 0.0) + post
            return [(p, w) for p, w in sorted(acc.items())]

        return words.map(run)

    return estep


def unigram_em_round(
    words: DataFrame, vocab: dict[str, float], max_len: int = _MAX_PIECE_LEN
) -> DataFrame:
    """One EM pass over the word dictionary with the broadcast ``vocab``
    (piece → log prob): E-step pandas UDF + explode, M-step = ONE hash
    aggregation. Returns (piece, prob) normalized to Σ=1."""
    ex = _estep_udf(vocab, max_len)
    counts = (
        words.select(F.explode(ex(F.col("word"))).alias("e"), F.col("freq"))
        .select(F.col("e.piece").alias("piece"), (F.col("e.w") * F.col("freq")).alias("w"))
        .groupBy("piece")
        .agg(F.sum("w").alias("w"))
    )
    total = counts.agg(F.sum("w")).first()[0]
    return counts.select("piece", (F.col("w") / F.lit(float(total))).alias("prob"))


def unigram_train(
    df: DataFrame,
    vocab_size: int = 64,
    seed_size: int = 256,
    n_iters: int = 3,
    text_col: str = "text",
    max_piece_len: int = _MAX_PIECE_LEN,
) -> DataFrame:
    """Train a unigram-LM piece vocabulary: seed → ``n_iters`` × (EM pass,
    prune to ``vocab_size`` keeping all single chars). Returns
    (piece, prob) with Σprob = 1 over the surviving vocabulary.

    Driver traffic per iteration: the vocab itself (≤ max(seed_size,
    vocab_size) rows — the same justified tiny-collect as the IVF
    centroids; data rows never leave executors)."""
    words = word_freq_table(df, text_col)
    words.persist()
    try:
        seed = seed_vocab(words, seed_size, max_piece_len)
        tot = seed.agg(F.sum("n")).first()[0]
        vocab = {
            r["piece"]: math.log(r["n"] / tot) for r in seed.collect()
        }
        for _ in range(n_iters):
            probs = unigram_em_round(words, vocab, max_piece_len)
            rows = probs.collect()
            rows.sort(key=lambda r: (-r["prob"], r["piece"]))
            kept: list = []
            multi_kept = 0
            budget = vocab_size
            n_chars = sum(1 for r in rows if len(r["piece"]) == 1)
            for r in rows:
                if len(r["piece"]) == 1:
                    kept.append(r)
                elif multi_kept < max(0, budget - n_chars):
                    kept.append(r)
                    multi_kept += 1
            z = sum(r["prob"] for r in kept)
            vocab = {r["piece"]: math.log(r["prob"] / z) for r in kept}
        spark = df.sparkSession
        return spark.createDataFrame(
            [(p, math.exp(lp)) for p, lp in sorted(vocab.items())],
            "piece string, prob double",
        )
    finally:
        words.unpersist()


def unigram_tokenize(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    out_col: str = "pieces",
    max_piece_len: int = _MAX_PIECE_LEN,
) -> DataFrame:
    """Viterbi segmentation of every word under the trained vocabulary;
    ``out_col`` = flat piece array over the whitespace-tokenized text.
    Ties break toward the LONGER leading piece (then lexicographic) so
    the output is deterministic. Vocab is collected once (vocab_size
    rows) and broadcast inside the UDF closure."""
    vmap = {r["piece"]: math.log(r["prob"]) for r in vocab.collect()}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def viterbi(texts: pd.Series) -> pd.Series:
        def seg_word(word: str) -> list[str]:
            n = len(word)
            best = [(-math.inf, -1, "")] * (n + 1)  # (score, start, piece)
            best[0] = (0.0, 0, "")
            for i in range(n):
                s_i = best[i][0]
                if s_i == -math.inf:
                    continue
                hi = min(n, i + max_piece_len)
                found = False
                for j in range(i + 1, hi + 1):
                    p = word[i:j]
                    lp = vmap.get(p)
                    if lp is None:
                        continue
                    found = True
                    cand = (s_i + lp, i, p)
                    # strictly better, or equal score with longer piece
                    if cand[0] > best[j][0] + 1e-12 or (
                        abs(cand[0] - best[j][0]) <= 1e-12
                        and (j - i, p) > (j - best[j][1], best[j][2])
                    ):
                        best[j] = cand
                if not found:
                    cand = (s_i + _UNK_LOG_FLOOR, i, word[i : i + 1])
                    if cand[0] > best[i + 1][0]:
                        best[i + 1] = cand
            out: list[str] = []
            j = n
            while j > 0:
                _, i, p = best[j]
                out.append(p)
                j = i
            out.reverse()
            return out

        def run(text: str) -> list[str]:
            if text is None:
                return []
            pieces: list[str] = []
            for w in text.split():
                pieces.extend(seg_word(w))
            return pieces

        return texts.map(run)

    return df.withColumn(out_col, viterbi(F.col(text_col)))
