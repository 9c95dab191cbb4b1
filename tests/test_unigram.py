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


# --- corpus statistics: collocations / χ² keywords / Heaps curve -----------
def test_phrase_pmi_finds_collocation(spark):
    from opentelemetry_collector_contrib_spark.operators.textstats import phrase_pmi

    # "new york" always together; "the" everywhere (high freq -> low score)
    rows = [("new york is big the end",)] * 10 + [("the cat sat on the mat",)] * 10
    df = spark.createDataFrame(rows, "text string")
    out = phrase_pmi(df, min_count=5, top_k=20).collect()
    scores = {(r["a"], r["b"]): r["score"] for r in out}
    # score = (10-5) * N / (10*10); N = 120 tokens -> 5*120/100 = 6.0
    assert scores[("new", "york")] == 6.0
    # pairs involving the 30-count "the" score 3x lower: 5*120/(10*30)
    assert scores[("on", "the")] == pytest.approx(5 * 120 / 300, abs=1e-6)
    assert scores[("new", "york")] > scores[("on", "the")]


def test_chi2_keywords_distinctive_terms(spark):
    from opentelemetry_collector_contrib_spark.operators.textstats import chi2_keywords

    rows = [("en", "hello world common")] * 20 + [("de", "hallo welt common")] * 20
    df = spark.createDataFrame(rows, "lang string, text string")
    out = chi2_keywords(df, "lang", top_k=2, min_df=3).collect()
    per = {(r["cls"], r["term"]) for r in out}
    assert ("en", "hello") in per and ("en", "world") in per
    assert ("de", "hallo") in per and ("de", "welt") in per
    # 'common' appears in every doc of both classes -> not enriched anywhere
    assert not any(t == "common" for _, t in per)


def test_vocab_growth_monotone_and_exact(spark):
    from opentelemetry_collector_contrib_spark.operators.textstats import vocab_growth

    # 20 docs; doc i introduces token f"w{i}" plus the shared token "x"
    rows = [(f"d{i:02d}", f"x w{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = sorted(vocab_growth(df, checkpoints=4).collect(), key=lambda r: r["checkpoint"])
    assert [r["n_docs"] for r in out] == [5, 10, 15, 20]
    assert [r["n_tokens"] for r in out] == [10, 20, 30, 40]
    # vocab: 5 new words + 'x' at cp1, then +5 per checkpoint
    assert [r["vocab"] for r in out] == [6, 11, 16, 21]


def test_diversity_indices_hand_case(spark):
    from opentelemetry_collector_contrib_spark.operators.textstats import diversity_indices

    # source A: 4 tokens all distinct -> simpson 0, TTR 1
    # source B: "x x x x" -> simpson 1 (every pair identical), eff vocab 1
    df = spark.createDataFrame(
        [("A", "a b c d"), ("B", "x x x x")], "source string, text string"
    )
    rows = {r["source"]: r for r in diversity_indices(df, "source").collect()}
    assert rows["A"]["vocab"] == 4 and rows["A"]["type_token_ratio"] == 1.0
    assert rows["A"]["simpson"] == 0.0
    assert rows["A"]["effective_vocab"] is None  # no repeated pair: unbounded
    assert rows["B"]["simpson"] == 1.0 and rows["B"]["effective_vocab"] == 1.0
