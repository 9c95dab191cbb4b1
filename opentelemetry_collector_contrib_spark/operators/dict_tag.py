"""Dictionary phrase tagging — scalable keyword/blocklist matching for
corpus curation (brand-safety blocklists, topic lexicons, compliance
term sets). No reference-collector counterpart (their filtering is
regex-per-record); this is the scale-correct equivalent of an
Aho-Corasick dictionary scan, re-expressed relationally:

  1. normalize: lowercase, whitespace-tokenize, strip edge punctuation;
  2. emit every 1..max_ngram-word window (positional, one posexplode —
     output rows ≤ max_ngram × token count, bounded);
  3. hash-join the windows against the BROADCAST dictionary (term → tag).

Why this beats per-row regex alternation at 10^12 docs: an alternation
of 10^5 terms recompiles per executor and scans each text 10^5 times
at worst; the n-gram join scans each text once, the dictionary ships
once per executor, and Catalyst keeps the probe side pipelined — no
shuffle on the corpus. For dictionaries too large to broadcast, the same
plan degrades gracefully to a shuffle hash join on the term — switch is
one hint, not a rewrite.

Matching is exact on normalized word boundaries (the dictionary must be
pre-normalized the same way); substring matches inside words are out of
scope by design — that is what dedup_ngram_spans' character shingles
cover.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._catalyst import bind_once

_EDGE_PUNCT = r"^[^\p{L}\p{Nd}]+|[^\p{L}\p{Nd}]+$"


def _norm_tokens(text: Column) -> Column:
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    cleaned = F.transform(toks, lambda t: F.regexp_replace(t, _EDGE_PUNCT, ""))
    return F.filter(cleaned, lambda t: t != "")


def tag_matches(
    docs: DataFrame,
    dictionary: DataFrame,
    max_ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
    tag_col: str = "tag",
    first_token_gate: bool = True,
) -> DataFrame:
    """One row per (document, position, matched term): (id, pos, term,
    tag). ``pos`` is the 0-based token index where the phrase starts.

    Window construction cost is O(tokens × max_ngram) per doc: the token
    array binds ONCE as a higher-order-function lambda variable (so
    Catalyst never re-inlines the tokenizer per reference) and each
    window extends via O(1) ``get`` lookups — never a per-position
    ``slice`` (which is O(tokens) each and turns the builder O(n²)).

    ``first_token_gate`` (round 4, default on): a literal Bloom filter
    over the dictionary's FIRST tokens gates window construction — a
    position whose token cannot start any term builds no grams at all,
    so the posexplode and join probe volume drops from
    max_ngram × tokens to max_ngram × candidate positions (typically a
    tiny fraction for blocklist-shaped dictionaries). The broadcast join
    still verifies exactly, so Bloom false positives only cost a probe —
    results are byte-identical with the gate on or off. The distinct
    first-token collect is bounded by the dictionary, which is
    broadcast-sized by contract."""
    gate = None
    if first_token_gate:
        from .enrich import bloom_build, bloom_might_contain, bloom_parameters

        firsts = dictionary.select(
            F.get(F.split(F.lower(F.col(term_col)), " "), 0).alias("ft")
        ).distinct()
        n_first = max(firsts.count(), 1)
        num_bits, num_hashes = bloom_parameters(n_first, 0.01)
        bitmap = bloom_build(firsts, "ft", num_bits, num_hashes)
        gate = lambda tok: bloom_might_contain(tok, bitmap, num_hashes)  # noqa: E731

    def grams_of(t: Column) -> Column:
        if gate is not None:
            # candidate start positions only: gate evaluated once per token
            starts = F.filter(
                F.transform(t, lambda tok, i: F.when(gate(tok), i)),
                lambda x: x.isNotNull(),
            )
        else:
            starts = F.transform(t, lambda _tok, i: i)
        per_n = []
        for n in range(1, max_ngram + 1):
            windows = F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.when(
                        i + n <= F.size(t),
                        F.concat_ws(
                            " ", F.get(t, i), *[F.get(t, i + j) for j in range(1, n)]
                        ),
                    ).alias("gram"),
                ),
            )
            per_n.append(F.filter(windows, lambda s: s["gram"].isNotNull()))
        return F.flatten(F.array(*per_n))

    # bind the normalized token array once (lambda variable), then build
    # all 1..max_ngram windows against that binding
    grams = bind_once(_norm_tokens(F.col(text_col)), grams_of)
    exploded = docs.select(F.col(id_col), F.explode(grams).alias("g")).select(
        id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram")
    )
    dim = dictionary.select(F.col(term_col).alias("gram"), F.col(tag_col).alias("tag"))
    return exploded.join(F.broadcast(dim), "gram").select(
        id_col, "pos", F.col("gram").alias("term"), "tag"
    )


def tag_summary(
    docs: DataFrame,
    dictionary: DataFrame,
    max_ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document rollup: hit count, sorted distinct tags and terms.
    Documents with no matches keep hits=0 and empty CSVs (left join), so
    the output is a total function of the corpus — a curation gate can
    filter on it directly."""
    m = tag_matches(docs, dictionary, max_ngram, id_col=id_col, text_col=text_col)
    agg = m.groupBy(id_col).agg(
        F.count("*").alias("hits"),
        F.concat_ws(",", F.array_sort(F.collect_set("tag"))).alias("tags_csv"),
        F.concat_ws(",", F.array_sort(F.collect_set("term"))).alias("terms_csv"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.coalesce(F.col("tags_csv"), F.lit("")).alias("tags_csv"),
            F.coalesce(F.col("terms_csv"), F.lit("")).alias("terms_csv"),
        )
    )
