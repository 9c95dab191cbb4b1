"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

These extend the collector's log-quality surface (severity parsing,
redaction, filtering) to the document-corpus operations a 100 TB
training-data pipeline needs. Everything here is pure Catalyst — single
projection, whole-stage codegen, zero shuffle — so it runs at scan speed.

Engine-portability contract (the DuckDB oracle must reproduce every value
bit-for-bit): tokenization is `\\s+` on trimmed text, the portable 60-bit
hash is `int(md5(x)[:15], 16)` (Spark: conv(substr(md5,1,15),16,10); DuckDB:
('0x'||substr(md5,1,15))::BIGINT), and all ratios are rounded to 6 places
on both sides.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# portable primitives
# ---------------------------------------------------------------------------


def h60(col: Column) -> Column:
    """Portable 60-bit positive hash: int(md5(x)[:15], 16). Identical in
    DuckDB as CAST('0x' || substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def u60(col: Column) -> Column:
    """Portable uniform in [0, 1): h60/2^60. The ONE normalization every
    hash-seeded draw (Laplace noise, bootstrap weights) must share — a
    second hand-rolled copy that drifts desynchronizes Spark from every
    oracle. DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT) /
    1152921504606846976.0."""
    return h60(col) / F.lit(float(1 << 60))


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe, identical to DuckDB's
    regexp_split_to_array(trim(x), '\\s+') filtered of empties."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def shingles_of(tok_col: Column, n: int = 3) -> Column:
    """n-word shingles (distinct) from a token-array expression.

    Index-free formulation: zip_with over n shifted slices of the array.
    The naive `transform(sequence(...), i -> element_at(toks, i+j))` is a
    performance trap — Catalyst inlines the tokenizer expression into the
    lambda (projection collapse) and re-splits the text once per element
    per offset, O(tokens^2) per doc (measured 10x on the 5k-doc corpus).
    slice/zip_with evaluate the array expression a constant number of
    times regardless of length."""
    m = F.size(tok_col) - (n - 1)
    acc = F.slice(tok_col, F.lit(1), m)
    for j in range(1, n):
        nxt = F.slice(tok_col, F.lit(j + 1), m)
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat_ws(" ", a, b))
    shingle = F.when(F.size(tok_col) >= n, acc).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(shingle)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Shingles straight from a text column."""
    return shingles_of(tokens(col), n)


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles") -> DataFrame:
    return df.withColumn(out, word_shingles(F.col(text_col), n))


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape, reduced to an RE2/Java-regex-portable
# class split: letter runs | digit runs | single non-space symbol.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_c, n_ws_tokens, n_bpe_tokens, avg_token_len."""
    t = F.col(text_col)
    toks = tokens(t)
    # counts as BIGINT: DuckDB's length()/len() are BIGINT, and the driver
    # hash is type-sensitive — match the wider type
    return df.select(
        "*",
        F.length(t).cast("long").alias("n_chars_c"),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.length(F.regexp_replace(t, r"\s", "")) / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]
_STOP_RE = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
_PUNCT_RE = r"[^\w\s]"
_DIGIT_RE = r"[0-9]"


# ---------------------------------------------------------------------------
# pluggable model hook: lang_id / quality_score are interfaces with a
# reference heuristic implementation. A real curation pipeline mounts a
# fastText-class LID or a perplexity/classifier quality model here: any
# picklable object with predict_batch(pd.Series) -> pd.Series plugs in and
# rides a Spark broadcast into an Arrow-batched pandas UDF — deserialized
# once per executor, applied per batch (the same mapInPandas shape as the
# multimodal codecs). The heuristic default keeps the DuckDB oracle
# contract intact; a mounted model replaces only the scoring column.
# ---------------------------------------------------------------------------


class BatchModel:
    """Duck-typed contract for mounted models: implement
    predict_batch(texts: pd.Series) -> pd.Series (same length/index).
    The instance ships inside the UDF closure (cloudpickle, so locally
    defined classes work); heavyweight weights should load lazily on
    first predict_batch call so each executor pays the load once."""

    def predict_batch(self, texts):  # pragma: no cover - interface only
        raise NotImplementedError


def _model_column(df: DataFrame, text_col: str, model, rettype: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(rettype)
    def run(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # `model` rides the cloudpickled closure — deserialized once per
        # python worker, reused across its batches (iterator UDF form)
        for batch in it:
            yield model.predict_batch(batch)

    return run(F.col(text_col))


def quality_score(df: DataFrame, text_col: str = "text", model: "BatchModel | None" = None) -> DataFrame:
    """Doc quality in [0,1]. Default = fixed heuristic (long enough, some
    stopwords — real prose has them — not punctuation- or digit-heavy),
    portable to the SQL oracle. Pass `model` to replace the quality column
    with a broadcast model's scores; the feature ratios stay columnar
    either way (they are scan-speed and feed downstream filters)."""
    t = F.col(text_col)
    n_tok = F.size(tokens(t))
    n_char = F.greatest(F.length(t), F.lit(1))
    stop_ratio = F.regexp_count(F.lower(t), F.lit(_STOP_RE)) / F.greatest(n_tok, F.lit(1))
    punct_ratio = F.regexp_count(t, F.lit(_PUNCT_RE)) / n_char
    digit_ratio = F.regexp_count(t, F.lit(_DIGIT_RE)) / n_char
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.15) * (F.lit(1.0) - F.least(digit_ratio * 5, F.lit(1.0)))
    )
    if model is not None:
        score = _model_column(df, text_col, model, "double")
    return df.select(
        "*",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
# language ID (marker-word n-gram heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, str] = {
    "en": r"\b(?:the|and|of|to|is|was|with)\b",
    "de": r"\b(?:der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(?:le|la|les|et|est|pas|avec)\b",
    "es": r"\b(?:el|los|las|y|es|no|con)\b",
}
_LANG_ORDER = list(LANG_MARKERS)


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    model: "BatchModel | None" = None,
) -> DataFrame:
    """Language ID. Default = deterministic marker-word scoring; argmax
    with fixed tie order (en > de > fr > es), 'und' when every score is
    zero. Pass `model` (BatchModel) to mount a real LID classifier via the
    broadcast pandas-UDF hook."""
    if model is not None:
        return df.select("*", _model_column(df, text_col, model, "string").alias(out_col))
    t = F.lower(F.col(text_col))
    scores = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pick = F.when(best == 0, F.lit("und"))
    for lang in _LANG_ORDER:  # first max wins, fixed order
        pick = pick.when(scores[lang] == best, F.lit(lang))
    out = df.select("*", pick.alias(out_col))
    return out


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints per doc:
    fp_exact   — 60-bit hash of whitespace-normalized lowercase text
                 (exact-dup key; normalization makes it robust to spacing)
    fp_shingle — lexicographic-min md5 over 3-word shingles (a 1-hash
                 MinHash: equal for word-shuffle-light near-dups, cheap
                 first-pass near-dup key)
    """
    t = F.col(text_col)
    staged = df.withColumn("_toks", tokens(t)).withColumn("_sh", shingles_of(F.col("_toks"), 3))
    norm = F.lower(F.concat_ws(" ", F.col("_toks")))
    min_md5 = F.array_min(F.transform(F.col("_sh"), lambda s: F.md5(s)))
    return staged.select(
        *df.columns,
        h60(norm).alias("fp_exact"),
        min_md5.alias("fp_shingle"),
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    max_chars: int = 2000,
    out_col: str = "char_entropy",
) -> DataFrame:
    """Shannon entropy (bits/char) of the character distribution over the
    first `max_chars` characters — the classic gibberish / binary-blob /
    key-dump detector: natural language sits ~3.5-4.5 bits, base64 and
    random hex push toward log2(alphabet), single-char spam collapses
    toward 0. Complements the word-level Gopher signals
    (curation.repetition_stats), which are blind to sub-word garbage.

    H = log2(n) − Σ c·log2(c) / n over per-char counts c. Computed as ONE
    scan-speed projection with zero shuffle: chars → array_sort → a single
    linear fold that accumulates c·log2(c) per equal-run (the same
    sorted-run trick as repetition_stats' top-bigram count, O(m log m)
    per row, bounded by the cap). Empty text scores 0.0. Rounded to 6
    places (both engines sum float logs in different orders).
    """
    s = F.substring(F.col(text_col), 1, max_chars)
    n = F.length(s)
    # sequence(1, 0) descends in Spark — guard the empty string explicitly
    chars = F.when(
        n > 0, F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(s, i, F.lit(1)))
    ).otherwise(F.array().cast("array<string>"))
    run_log = lambda run: run.cast("double") * F.log2(run.cast("double"))  # noqa: E731
    fold = F.aggregate(
        F.array_sort(chars),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0.0).alias("acc")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            # close out the previous run when the char changes
            F.when(x == a["prev"], a["acc"])
            .otherwise(a["acc"] + F.when(a["run"] > 0, run_log(a["run"])).otherwise(F.lit(0.0)))
            .alias("acc"),
        ),
        lambda a: a["acc"] + F.when(a["run"] > 0, run_log(a["run"])).otherwise(F.lit(0.0)),
    )
    h = F.when(n > 0, F.round(F.log2(n.cast("double")) - fold / n.cast("double"), 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(*df.columns, h.alias(out_col))


# ---------------------------------------------------------------------------
# document chunking (training-data windowing)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunks per document — the standard
    pretraining/RAG windowing step: windows of `chunk_tokens` tokens with
    `overlap` tokens of context carried between consecutive chunks.
    Pure array expressions (tokenize once, slice per window, posexplode);
    the chunk count per doc is ceil((n_tok - overlap) / stride), always
    >= 1 so short documents still emit one (possibly short) chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n_tok = F.greatest(F.size("_toks"), F.lit(1))
    n_chunks = F.ceil((n_tok - F.lit(overlap)) / F.lit(stride)).cast("int")
    # chunk indexes explode FIRST; the window slice runs above the Generate
    # node where _toks is a bound attribute (tokenized once per doc) —
    # slicing inside a transform() lambda would re-tokenize per chunk
    # (the projection-collapse trap shingles_of documents)
    rows = toks.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, F.lit(chunk_tokens))
    return rows.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# corpus analytics: TF-IDF keyword extraction, per-source corpus summary
# ---------------------------------------------------------------------------


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)) + 1, the scikit-learn smooth_idf formula —
    a published constant-safe variant that never divides by zero).
    Output: (id, term, tf, df, score, rank) for the k highest-scoring
    terms per doc; ties broken by term text so results are deterministic.

    Scale: tokenize-once + posexplode to term grain, ONE (doc, term)
    hash agg (map-side combined), a term-grain agg for document
    frequency, an equi-join back on the term key, then a top-k window
    per doc — which Spark compiles with WindowGroupLimit, so each map
    task ships at most k rows per doc into the final exchange. The term
    dictionary is joined, not broadcast: at 100 TB it does not fit in a
    broadcast, and the join key (term) is the same key the df-aggregation
    already partitioned on, so AQE reuses the exchange. N (corpus size)
    is one count job, inlined as a literal."""
    n_docs = df.select(id_col).count()
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * (F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def corpus_summary(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus report — the observability surface of a curation
    pipeline: document count, total whitespace tokens, mean document
    chars, distinct text count (h60 exact-dedup key) and the implied
    duplicate fraction. One aggregation, map-side combined; the exact
    distinct is a second pass Spark plans as expand+agg — still one
    logical groupBy, no join."""
    n = F.count(F.lit(1))
    return df.groupBy(group_col).agg(
        n.alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("n_tokens"),
        F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
        F.countDistinct(h60(F.col(text_col))).alias("n_distinct_texts"),
        F.round(
            F.lit(1.0) - F.countDistinct(h60(F.col(text_col))) / n.cast("double"), 6
        ).alias("dup_frac"),
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplication matrix — the "data Venn" a corpus audit
    runs before mixing sources: for every source pair (a ≤ b, including
    the a = a diagonal), how many DISTINCT text keys appear in both, and
    what fraction of each side that overlap is. A source that is 40%
    contained in another is a mixture-weights bug waiting to happen (the
    duplicated mass silently doubles its effective weight); the diagonal
    gives each source's own distinct-key count for reference.

    Keys are the h60 exact-dedup hash of the text (compose with
    curation.canonicalize_text upstream for normalization-insensitive
    keys, or swap in a MinHash band key for near-dup overlap — the matrix
    shape is key-agnostic).

    Output: (src_a, src_b, n_overlap, n_a, n_b, frac_of_a, frac_of_b),
    src_a <= src_b.

    Scale: one distinct on (source, key) — fixed-width rows, map-side
    combined — then a self-equi-join ON KEY (each key meets only its own
    other-source copies; a key present in s sources contributes s² rows,
    never a cross join) and a hash agg on the (src_a, src_b) pair, whose
    cardinality is sources², tiny. Per-source totals ride the same
    distinct frame; the final join is broadcast-size."""
    keyed = df.select(
        F.col(group_col).alias("_src"), h60(F.col(text_col)).alias("_k")
    ).distinct()
    totals = keyed.groupBy("_src").agg(F.count(F.lit(1)).alias("_n"))
    a = keyed.select(F.col("_src").alias("src_a"), "_k")
    b = keyed.select(F.col("_src").alias("src_b"), "_k")
    overlap = (
        a.join(b, "_k")
        .filter(F.col("src_a") <= F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    ta = totals.select(F.col("_src").alias("src_a"), F.col("_n").alias("n_a"))
    tb = totals.select(F.col("_src").alias("src_b"), F.col("_n").alias("n_b"))
    return (
        overlap.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_overlap",
            "n_a",
            "n_b",
            F.round(F.col("n_overlap") / F.col("n_a"), 6).alias("frac_of_a"),
            F.round(F.col("n_overlap") / F.col("n_b"), 6).alias("frac_of_b"),
        )
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """BM25 retrieval scoring: top-k documents per query.

    Okapi BM25 with the Robertson/Lucene non-negative idf,
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — the retrieval pass a training
    pipeline runs to mine paired data or dedup against a query set.

    Scale: doc side is tokenized once into a (doc, term, tf) index with
    per-doc lengths (two hash aggs); candidates come from an inverted
    equi-join of query terms against that index — never a doc×query
    cross product; cost is Σ df(t) over query terms. ``max_df`` drops
    stop-like terms from candidate GENERATION (the classic df cap that
    bounds join skew at corpus scale; scoring semantics shift accordingly
    — the oracle gate runs uncapped). Corpus constants N and avgdl are
    two driver-side scalars inlined as literals. Final top-k is one
    window per query (WindowGroupLimit), ties broken by doc id.
    """
    d_terms = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = d_terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dlen = d_terms.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    row = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    ).first()
    n_docs, avgdl = row["n"], float(row["avgdl"])

    q_terms = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(F.array_distinct(tokens(F.col(query_text_col)))).alias("term"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    cand = (
        q_terms.join(dfreq, "term")
        .join(tf, "term")
        .join(dlen, "doc")
        .select(
            "qid",
            "doc",
            "term",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("s"),
        )
    )
    # term-sorted sequential fold, NOT F.sum: float addition is not
    # associative, and a partial-aggregation sum order varies run-to-run
    # and engine-to-engine — the fold pins one deterministic order (the
    # same trick the embedding dot-product oracle uses)
    scored = cand.groupBy("qid", "doc").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda a, x: a + x["s"],
        ).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    common_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Memorization-risk scoring: what fraction of a document's distinct
    word n-grams also appear in at least ``common_df`` OTHER documents.
    High commonality means the doc is mostly corpus-repeated phrasing
    (boilerplate, templates — memorization fuel); high novelty marks
    fresh text worth keeping. The metric companion to span REMOVAL
    (`dedup.remove_duplicated_spans` cuts; this scores).

    Scale: distinct grams per doc via one hash agg; gram document
    frequency via a second agg on the 60-bit gram hash (fixed-width
    shuffle key, never gram text); one equi-join back. Same inverted-
    index cost shape as the Jaccard/span family.
    """
    # shingles_of is already per-doc distinct, so no extra distinct (and
    # no extra Exchange) is needed before the df aggregation
    grams = (
        df.select(F.col(id_col).alias("doc"), shingles_of(tokens(F.col(text_col)), n).alias("gs"))
        .select("doc", F.explode("gs").alias("g"))
        .select("doc", h60(F.col("g")).alias("gh"))
    )
    gdf = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("gram_df"))
    j = grams.join(gdf, "gh")
    return (
        j.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("gram_df") > common_df, 1).otherwise(0))
            .cast("bigint")
            .alias("n_common"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "n_common",
            F.round(
                F.lit(1.0) - F.col("n_common") / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )


# --- collocation mining (word2phrase PMI-lift) ------------------------------
def phrase_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Phrase (collocation) mining by the word2phrase score (Mikolov et
    al. 2013): score(a,b) = (count(ab) − δ) · N / (count(a) · count(b))
    with δ = min_count — bigrams whose joint frequency beats the
    independence expectation become tokenizer-merge / phrase candidates.

    All-counts arithmetic (exact integers → one double division), so the
    score is engine-exact without transcendental rounding traps. Plan:
    one explode for unigram counts, one slide-zip explode for bigram
    counts, ONE equi-join per side token (unigram table, the only
    corpus-sized join), scalars inlined by a literal-key join of 1-row
    aggregates, top-k = TakeOrderedAndProject."""
    toks = df.select(tokens(F.col(text_col)).alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    n_uni = uni.agg(F.sum("c_tok").alias("n_uni")).withColumn("_k", F.lit(1))
    scored = (
        bi.join(uni.select(F.col("tok").alias("a"), F.col("c_tok").alias("c_a")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c_tok").alias("c_b")), "b")
        .withColumn("_k", F.lit(1))
        .join(n_uni, "_k")
        .select(
            "a",
            "b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            F.round(
                (F.col("c_ab") - min_count).cast("double")
                * F.col("n_uni")
                / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("a"), F.col("b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .drop("rnk")
    )


# --- chi-squared distinctive keywords per class ------------------------------
def chi2_keywords(
    df: DataFrame,
    class_col: str,
    text_col: str = "text",
    top_k: int = 10,
    min_df: int = 3,
) -> DataFrame:
    """Per-class distinctive terms by the χ² statistic over the 2×2
    document-frequency table (term presence × class membership):
    χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). The classic feature-selection
    / corpus-characterization pass ("what words make this source
    different"). Presence counts (distinct per doc), not raw frequency —
    the standard formulation, and it bounds any single doc's influence.

    Integer-exact through the final division. One explode + distinct,
    two hash aggs, one equi-join on term, scalars by literal-key join;
    per-class top-k via WindowGroupLimit."""
    docs = df.select(F.col(class_col).alias("cls"), tokens(F.col(text_col)).alias("_t"))
    pres = docs.select("cls", F.explode(F.array_distinct("_t")).alias("term"))
    tc = pres.groupBy("cls", "term").agg(F.count(F.lit(1)).alias("a"))
    t_tot = pres.groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    c_tot = docs.groupBy("cls").agg(F.count(F.lit(1)).alias("n_c"))
    n_tot = docs.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    j = (
        tc.join(t_tot, "term")
        .filter(F.col("c_t") >= min_df)
        .join(c_tot, "cls")
        .withColumn("_k", F.lit(1))
        .join(n_tot, "_k")
    )
    a = F.col("a").cast("double")
    b = (F.col("c_t") - F.col("a")).cast("double")
    c = (F.col("n_c") - F.col("a")).cast("double")
    d = (F.col("n") - F.col("c_t") - F.col("n_c") + F.col("a")).cast("double")
    chi2 = (
        F.col("n")
        * (a * d - b * c)
        * (a * d - b * c)
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    scored = j.select(
        "cls",
        "term",
        F.col("a").cast("bigint").alias("df_in_class"),
        F.col("c_t").cast("bigint").alias("df_total"),
        F.round(chi2, 6).alias("chi2"),
    ).filter(a * (F.col("n") * 1.0) > F.col("c_t") * F.col("n_c"))  # enriched only
    w = Window.partitionBy("cls").orderBy(F.col("chi2").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .drop("rnk")
    )


# --- vocabulary growth (Heaps' law) ------------------------------------------
def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoints: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct vocabulary and
    cumulative token count at each corpus-prefix checkpoint (docs ordered
    by id — deterministic), the measurement behind tokenizer vocab sizing
    and "is more data still adding words" decisions.

    Each token contributes its FIRST-occurrence doc rank (one min agg
    over the exploded stream); each checkpoint then counts tokens whose
    first occurrence falls at or before it — a histogram over checkpoint
    buckets. Integer-exact.

    Scale shape (round-4 rewrite): the doc rank comes from the two-pass
    distributed row_number (operators/rank.py) — range-bucketed,
    broadcast offsets — NEVER an unpartitioned window funneling the
    corpus through one task; the cumulative finish runs driver-side over
    the ≤`checkpoints`-row aggregate, so the plan contains no WindowExec
    at all. Eager (collects two ≤`checkpoints`-row aggregates)."""
    from .rank import global_row_number

    spark = df.sparkSession
    schema = "checkpoint INT, n_docs BIGINT, n_tokens BIGINT, vocab BIGINT"
    ranked, n_docs = global_row_number(
        df.select(F.col(id_col).alias("_vid"), tokens(F.col(text_col)).alias("_t")),
        [("_vid", "asc")],
        out_col="_r",
    )
    if n_docs == 0:
        return spark.createDataFrame([], schema)
    # checkpoint index of a doc rank: ceil(rank * K / n_docs) in 1..K
    cp = F.ceil(F.col("_r") * checkpoints / F.lit(n_docs)).cast("int")
    staged = ranked.select(cp.alias("_cp"), "_t")
    tok_first = (
        staged.select(F.explode("_t").alias("tok"), "_cp")
        .groupBy("tok")
        .agg(F.min("_cp").alias("_fcp"))
        .groupBy("_fcp")
        .agg(F.count(F.lit(1)).alias("_new_vocab"))
    )
    per_cp = staged.groupBy("_cp").agg(
        F.count(F.lit(1)).alias("_docs"),
        F.sum(F.size("_t")).alias("_toks"),
    )
    nv = {r["_fcp"]: r["_new_vocab"] for r in tok_first.collect()}
    pc = {r["_cp"]: (r["_docs"], r["_toks"] or 0) for r in per_cp.collect()}
    out, cd, ct, cv = [], 0, 0, 0
    for c in sorted(pc):
        cd += pc[c][0]
        ct += pc[c][1]
        cv += nv.get(c, 0)
        out.append((c, cd, ct, cv))
    return spark.createDataFrame(out, schema)


# --- corpus diversity indices ------------------------------------------------
def diversity_indices(
    df: DataFrame,
    class_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Token-distribution diversity per class (or whole-corpus): vocabulary
    size, token count, type-token ratio, the UNBIASED Simpson concentration
    Σ c_i(c_i−1) / (N(N−1)) (probability two draws without replacement are
    the same type — integer-exact, no entropy/log needed), and its inverse
    (effective vocabulary: how many equally-common types would concentrate
    the same). The corpus-balance monitor for mixture design — a source
    whose effective vocab collapses is template spam even when raw vocab
    looks healthy.

    One explode + two hash aggs, everything integer until two final
    divisions."""
    keys = [class_col] if class_col else []
    toks = df.select(*keys, F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = toks.groupBy(*keys, "tok").agg(F.count(F.lit(1)).alias("_c"))
    agg = counts.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("_c").cast("bigint").alias("n_tokens"),
        F.sum(F.col("_c") * (F.col("_c") - 1)).cast("bigint").alias("_rep"),
    )
    # NULL guards (ANSI mode): simpson undefined for n_tokens < 2;
    # effective vocab unbounded (NULL) when no pair repeats
    simpson = F.when(
        F.col("n_tokens") > 1,
        F.col("_rep") / (F.col("n_tokens") * (F.col("n_tokens") - 1)),
    )
    return agg.select(
        *keys,
        "vocab",
        "n_tokens",
        F.round(F.col("vocab") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        F.round(simpson, 6).alias("simpson"),
        F.round(F.when(F.col("_rep") > 0, F.lit(1.0) / simpson), 6).alias("effective_vocab"),
    )
