"""Unigram-LM tokenizer training invariants (operators/unigram.py).

No SQL oracle (lattice forward-backward — same gating as the HLL state);
gated instead on the algorithm's own guarantees: coverage/round-trip
losslessness, probability normalization, likelihood monotonicity of EM,
convergence to planted pieces, determinism across reruns.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.unigram import (
    seed_vocab,
    unigram_em_round,
    unigram_tokenize,
    unigram_train,
    word_freq_table,
)


@pytest.fixture(scope="module")
def toy(spark):
    # a corpus with two strongly repeating multi-char units
    rows = [("abab abab cdcd",)] * 30 + [("abab cdcd cdcd",)] * 20 + [("xy",)] * 3
    return spark.createDataFrame(rows, "text string")


@pytest.fixture(scope="module")
def trained(toy):
    return unigram_train(toy, vocab_size=12, seed_size=64, n_iters=3).persist()


def test_probabilities_normalized_and_chars_kept(trained, toy):
    rows = trained.collect()
    assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-9
    pieces = {r["piece"] for r in rows}
    corpus_chars = {c for r in toy.collect() for c in r["text"] if not c.isspace()}
    assert corpus_chars <= pieces  # total coverage survives pruning


def test_planted_pieces_win(trained):
    rows = {r["piece"]: r["prob"] for r in trained.collect()}
    # the repeating units (or their doublings) dominate the learned vocab:
    # 'ab' mass may concentrate on 'abab' — assert the family, not one form
    ab_mass = sum(p for pc, p in rows.items() if set(pc) <= {"a", "b"} and len(pc) > 1)
    cd_mass = sum(p for pc, p in rows.items() if set(pc) <= {"c", "d"} and len(pc) > 1)
    assert ab_mass > 0.2 and cd_mass > 0.2
    # the rare word's chars exist but carry little mass
    assert rows.get("x", 0) + rows.get("y", 0) < 0.1


def test_tokenize_round_trip_and_determinism(toy, trained):
    out = unigram_tokenize(toy.distinct(), trained)
    for r in out.collect():
        assert "".join(r["pieces"]) == r["text"].replace(" ", "")
    again = unigram_tokenize(toy.distinct(), trained)
    a = sorted(tuple(r["pieces"]) for r in out.collect())
    b = sorted(tuple(r["pieces"]) for r in again.collect())
    assert a == b


def test_tokenize_prefers_trained_units(toy, trained):
    out = unigram_tokenize(
        toy.sparkSession.createDataFrame([("abab cdcd",)], "text string"), trained
    ).first()["pieces"]
    # segmentation uses multi-char units, not per-char fallback
    assert all(len(p) > 1 for p in out), out


def test_unknown_chars_fall_back_per_char(spark, trained):
    out = unigram_tokenize(
        spark.createDataFrame([("abQQ",)], "text string"), trained
    ).first()["pieces"]
    assert "".join(out) == "abQQ"
    assert "Q" in out  # unk chars become singleton pieces


def _corpus_loglik(words, vocab, spark):
    """Σ freq · log P(word) under the lattice (recompute via forward pass
    through unigram_em_round's own UDF would hide it; do it directly)."""
    # total log-prob per word: a tiny forward pass in plain python with the
    # same vocab dict and the same unk floor as the executor-side UDF
    def fwd(word: str) -> float:
        n = len(word)
        f = [-math.inf] * (n + 1)
        f[0] = 0.0
        for i in range(n):
            if f[i] == -math.inf:
                continue
            covered = False
            hi = min(n, i + 8)
            for j in range(i + 1, hi + 1):
                lp = vocab.get(word[i:j])
                if lp is None:
                    continue
                covered = True
                c = f[i] + lp
                m = f[j] if f[j] > c else c
                f[j] = (
                    c
                    if f[j] == -math.inf
                    else m + math.log(math.exp(f[j] - m) + math.exp(c - m))
                )
            if not covered:
                c = f[i] + (-20.0)
                if c > f[i + 1]:
                    f[i + 1] = c
        return f[n]

    return sum(r["freq"] * fwd(r["word"]) for r in words.collect())


def test_em_round_does_not_decrease_likelihood(toy, spark):
    words = word_freq_table(toy)
    seed = seed_vocab(words, 64)
    tot = seed.agg(F.sum("n")).first()[0]
    v0 = {r["piece"]: math.log(r["n"] / tot) for r in seed.collect()}
    l0 = _corpus_loglik(words, v0, spark)
    p1 = unigram_em_round(words, v0)
    v1 = {r["piece"]: math.log(r["prob"]) for r in p1.collect()}
    l1 = _corpus_loglik(words, v1, spark)
    assert l1 >= l0 - 1e-6  # EM guarantee (no pruning between these passes)
