"""Driver-contract registry: training-data pipeline queries over the
driver's `documents` and `embeddings` tables, each with a DuckDB oracle
implementing the SAME deterministic algorithm in SQL.

Portability contract (see operators/textstats.py):
  h60(x)      = int(md5(x)[:15], 16)
  tokens      = split trim(text) on \\s+, drop empties
  shingles    = distinct 3-word windows
  all ratios/cosines rounded to 6 places on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# SQL fragments mirroring the Spark-side portable primitives
# ---------------------------------------------------------------------------


def sql_h60(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


SQL_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"

SQL_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform("
    "generate_series(1, len(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
    " ELSE CAST([] AS VARCHAR[]) END"
)

SQL_DOT = (
    "list_sum(list_transform(generate_series(1, {dim}), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def sql_cosine(a: str, b: str, dim: int = 64) -> str:
    dot = SQL_DOT.format(a=a, b=b, dim=dim)
    na = SQL_DOT.format(a=a, b=a, dim=dim)
    nb = SQL_DOT.format(a=b, b=b, dim=dim)
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"


_DOC_TOKS_CTE = f"""
WITH d AS (SELECT doc_id, text FROM documents),
tokd AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM d)
"""

_SHINGLE_CTE = (
    _DOC_TOKS_CTE
    + f""",
shing_list AS (SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tokd),
shing AS (SELECT doc_id AS doc, unnest(shingles) AS shingle FROM shing_list),
sizes AS (SELECT doc, count(*) AS n_sh FROM shing GROUP BY doc)
"""
)

# ---------------------------------------------------------------------------
# queries (Spark) — all read {sf_dir}/documents.parquet / embeddings.parquet
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures import ensure_tier, tier_for_sf_dir

    return spark.read.parquet(ensure_tier(tier_for_sf_dir(sf_dir)))


def q_token_stats(spark, sf_dir):
    from ..operators.textstats import token_stats

    return token_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars_c", "n_ws_tokens", "n_bpe_tokens", "avg_token_len"
    )


def q_quality(spark, sf_dir):
    from ..operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "stopword_ratio", "punct_ratio", "digit_ratio", "quality"
    )


def q_lang_id(spark, sf_dir):
    from ..operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_fingerprint(spark, sf_dir):
    from ..operators.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp_exact", "fp_shingle")


def q_dedup_exact(spark, sf_dir):
    from ..operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir), "doc_id")


def q_jaccard_pairs(spark, sf_dir):
    from ..operators.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf_dir), "doc_id", threshold=0.4)


def q_minhash_lsh_pairs(spark, sf_dir):
    from ..operators.dedup import minhash_lsh_dedup_pairs

    return minhash_lsh_dedup_pairs(_docs(spark, sf_dir), "doc_id", threshold=0.4)


def q_dedup_exact_incremental(spark, sf_dir):
    """Exact dedup computed incrementally (two id-ordered batches over a
    seen-text-key state) must equal the one-shot min-id-per-key keep set."""
    from pyspark.sql import functions as F

    from ..operators.dedup import exact_dedup_incremental

    docs = _docs(spark, sf_dir)
    state, parts = None, []
    for cond in (F.col("doc_id") < 250, F.col("doc_id") >= 250):
        novel, state = exact_dedup_incremental(docs.filter(cond), state, "doc_id")
        parts.append(novel.select("doc_id", "source", "n_chars"))
    return parts[0].unionByName(parts[1])


def q_dedup_keep_first(spark, sf_dir):
    """Keep-first near-dedup: doc survives iff no smaller-id doc is an LSH
    candidate with verified Jaccard >= 0.4 (operators/dedup.py
    dedup_keep_first)."""
    from ..operators.dedup import dedup_keep_first

    return dedup_keep_first(_docs(spark, sf_dir), "doc_id", threshold=0.4).select(
        "doc_id", "source", "n_chars"
    )


def q_dedup_keep_first_incremental(spark, sf_dir):
    """The same keep-first rule computed INCREMENTALLY: the corpus arrives
    as three id-ordered batches, each deduped against the accumulated
    (buckets, shingles) state — never rescanning earlier batches' text.
    The oracle is the one-shot full-corpus rule; equality IS the
    incremental-equals-batch claim."""
    from pyspark.sql import functions as F

    from ..operators.dedup import dedup_keep_first_incremental

    docs = _docs(spark, sf_dir)
    batches = [
        docs.filter(F.col("doc_id") < 150),
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 350)),
        docs.filter(F.col("doc_id") >= 350),
    ]
    state = None
    novel = []
    for b in batches:
        nv, state = dedup_keep_first_incremental(b, state, "doc_id", threshold=0.4)
        novel.append(nv.select("doc_id", "source", "n_chars"))
    out = novel[0]
    for nv in novel[1:]:
        out = out.unionByName(nv)
    return out


def q_multimodal_dhash(spark, sf_dir):
    """Perceptual image hash over the REAL PNG path: synthesized gradient
    PNGs decode to an 8x8 grid whose 56-bit row-gradient dHash is
    closed-form in doc_id (row y ascends iff bit y set), so the oracle
    reproduces it without touching pixels."""
    from ..operators.multimodal import png_dhash, synthesize_png_pattern

    docs = synthesize_png_pattern(_docs(spark, sf_dir).select("doc_id"))
    return png_dhash(docs).select("doc_id", "dhash")


def q_multimodal_dhash_pairs(spark, sf_dir):
    """Image near-dup pairs: dHash signatures -> the shared pigeonhole
    chunk blocking (8 chunks of 7 bits, hamming <= 7 guaranteed recall) ->
    bit_count verify. Same candidate shape as SimHash text near-dup."""
    from ..operators.dedup import hamming_blocked_pairs
    from ..operators.multimodal import png_dhash, synthesize_png_pattern

    sig = (
        png_dhash(synthesize_png_pattern(_docs(spark, sf_dir).select("doc_id")))
        .select(F.col("doc_id").alias("doc"), F.col("dhash").alias("sig"))
    )
    return hamming_blocked_pairs(sig, bits=56, max_hamming=7, chunks=8)


def q_simhash_pairs(spark, sf_dir):
    from ..operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), "doc_id", max_hamming=3)


def q_embedding_dup_pairs(spark, sf_dir):
    from ..operators.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_embs(spark, sf_dir), threshold=0.35)


def q_embedding_dup_pairs_bucketed(spark, sf_dir):
    from ..operators.dedup import embedding_dup_pairs_bucketed

    return embedding_dup_pairs_bucketed(_embs(spark, sf_dir), threshold=0.35, n_cells=8, probes=2)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup over the embeddings corpus: multi-probe cells, cosine
    >= 0.35 components, keep = least-prototypical member per component."""
    from ..operators.dedup import semantic_dedup

    return semantic_dedup(_embs(spark, sf_dir), threshold=0.35, n_cells=8, probes=2)


def _query_vectors(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )


def q_sim_recall_ivf(spark, sf_dir):
    """ANN acceptance metric: per-query recall@5 of the IVF index against
    the exact brute-force neighbors (operators/similarity.ann_recall_at_k)
    — both sides re-derived independently in the oracle."""
    from ..operators.similarity import ann_recall_at_k, brute_force_topk, ivf_topk

    emb = _embs(spark, sf_dir)
    q = _query_vectors(emb)
    return ann_recall_at_k(
        ivf_topk(emb, q, k=5, n_cells=8), brute_force_topk(emb, q, k=5), k=5
    )


def q_topk_brute(spark, sf_dir):
    from ..operators.similarity import brute_force_topk

    emb = _embs(spark, sf_dir)
    return brute_force_topk(emb, _query_vectors(emb), k=5)


def q_topk_ivf(spark, sf_dir):
    from ..operators.similarity import ivf_topk

    emb = _embs(spark, sf_dir)
    return ivf_topk(emb, _query_vectors(emb), k=5, n_cells=8)


def q_pq_codes(spark, sf_dir):
    """Product-quantization encode: every 64-dim vector → 4 codeword ids
    (16 codes/subspace, deterministic first-k codebooks). The codebook
    inlines as literals so assignment is one codegen projection — the
    64×-compression storage path for the ANN candidate sweep."""
    from ..operators.similarity import pq_codebooks, pq_encode

    e = _embs(spark, sf_dir)
    codes = pq_encode(pq_codebooks(e), e)
    return codes.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), "-").alias("codes_csv"),
    )


def q_topk_pq(spark, sf_dir):
    """ADC top-k over PQ codes: per-query integer LUT broadcast, O(m)
    gather-sum per candidate, exact-integer micro-unit distances so the
    ranking is engine-stable."""
    from ..operators.similarity import pq_codebooks, pq_encode, pq_topk_adc

    e = _embs(spark, sf_dir)
    cb = pq_codebooks(e)
    codes = pq_encode(cb, e)
    # max_queries=None: the query slice is fixture-proportional (2% of
    # embeddings) — the default guard would turn this parity query into a
    # scale-dependent hard error at larger tiers
    return pq_topk_adc(codes, cb, e.filter(F.col("vec_id") % 50 == 0), max_queries=None)


_DICT_TERMS = [
    ("spark", "engine"), ("stream", "engine"), ("customer", "entity"),
    ("slow query", "perf"), ("fast table", "perf"),
    ("window window", "dup"), ("batch batch", "dup"),
    ("value table part", "pattern"), ("the line sort", "pattern"),
]


def q_text_dict_tags(spark, sf_dir):
    """Dictionary phrase tagging over the documents corpus: 1-3-word
    lexicon broadcast-joined against positional n-gram windows — the
    Aho-Corasick-equivalent blocklist/topic tagger, one corpus scan,
    no shuffle on the doc side."""
    from ..operators.dict_tag import tag_summary

    dictionary = spark.createDataFrame(_DICT_TERMS, "term string, tag string")
    return tag_summary(_docs(spark, sf_dir), dictionary)


def q_sim_recall_ivfpq(spark, sf_dir):
    """recall@5 of the composed IVF+PQ index (integer-ADC over 4-byte
    codes, coarse-cell pruned) against exact brute-force — the quality
    number that decides whether the compressed index is shippable."""
    from ..operators.similarity import ann_recall_at_k, brute_force_topk, pq_topk_ivf_adc

    e = _embs(spark, sf_dir)
    approx = pq_topk_ivf_adc(e, e.filter(F.col("vec_id") % 50 == 0), max_queries=None)
    exact = brute_force_topk(e, _query_vectors(e), k=5)
    return ann_recall_at_k(approx, exact, k=5)


def q_topk_ivfpq(spark, sf_dir):
    """IVF+PQ composed ANN (the FAISS IVFPQ shape): coarse cells prune
    candidates to the query's nprobe=2 probes, integer-ADC scores only
    those candidates from their 4-byte codes — candidate volume AND
    scored bytes both collapse, the at-scale production path."""
    from ..operators.similarity import pq_topk_ivf_adc

    e = _embs(spark, sf_dir)
    # fixture-proportional query slice — see pq_topk_adc site
    return pq_topk_ivf_adc(e, e.filter(F.col("vec_id") % 50 == 0), max_queries=None)


def q_multimodal_features(spark, sf_dir):
    from ..operators.multimodal import attach_binary_payload, decode_and_featurize

    feat = decode_and_featurize(attach_binary_payload(_docs(spark, sf_dir)))
    cols = [F.round(F.element_at(F.col("features"), i + 1), 6).alias(f"f{i}") for i in range(8)]
    return feat.select("doc_id", "media_type", "payload_bytes", *cols)


def q_multimodal_frames(spark, sf_dir):
    from ..operators.multimodal import attach_binary_payload, sample_frames

    frames = sample_frames(attach_binary_payload(_docs(spark, sf_dir)), every_ms=1000)
    return frames.select("doc_id", "frame_ms")


def q_multimodal_wav_windows(spark, sf_dir):
    """Audio segmentation through the multimodal plumbing: synthesize real
    WAV containers, decode and split into 25 ms windows (200 samples at
    8 kHz), one row per window with exact sample count + RMS. Oracle =
    ground truth from the synthesis parameters (square wave: every
    window's RMS equals the amplitude; window count = ceil(n/200))."""
    from ..operators.multimodal import segment_wav_windows, synthesize_wav

    docs = synthesize_wav(_docs(spark, sf_dir).select("doc_id"))
    return segment_wav_windows(docs, window_ms=25)


def q_multimodal_wav(spark, sf_dir):
    """REAL audio decode through the multimodal plumbing: synthesize valid
    WAV containers per doc, parse them back with the stdlib codec inside an
    Arrow UDF. Oracle = ground truth from the synthesis parameters
    (constant-amplitude square wave → RMS == amplitude exactly)."""
    from ..operators.multimodal import decode_wav_features, synthesize_wav

    docs = synthesize_wav(_docs(spark, sf_dir).select("doc_id"))
    out = decode_wav_features(docs)
    return out.select(
        "doc_id",
        F.col("wav_meta.sample_rate").alias("sample_rate"),
        F.col("wav_meta.n_channels").alias("n_channels"),
        F.col("wav_meta.n_samples").alias("n_samples"),
        F.col("wav_meta.duration_ms").alias("duration_ms"),
        F.col("wav_meta.rms").alias("rms"),
    )


def q_multimodal_png(spark, sf_dir):
    """REAL image decode: genuine PNG containers (IHDR + zlib IDAT + CRCs)
    synthesized per doc and decoded back — header AND pixel path. Oracle =
    ground truth from the synthesis parameters (constant gray → mean pixel
    equals the gray value exactly)."""
    from ..operators.multimodal import decode_png_features, synthesize_png

    docs = synthesize_png(_docs(spark, sf_dir).select("doc_id"))
    out = decode_png_features(docs)
    return out.select(
        "doc_id",
        F.col("png_meta.width").alias("width"),
        F.col("png_meta.height").alias("height"),
        F.col("png_meta.bit_depth").alias("bit_depth"),
        F.col("png_meta.mean_pixel").alias("mean_pixel"),
    )


def q_curation_e2e(spark, sf_dir):
    """The composed training-data curation pipeline: quality gate → language
    gate → exact dedup → fingerprint + token stats of survivors. One
    declarative plan; Catalyst fuses the gates into the scan filter."""
    from ..operators.dedup import drop_exact_dups
    from ..operators.textstats import fingerprint, lang_id, quality_score, token_stats

    docs = _docs(spark, sf_dir)
    scored = lang_id(quality_score(docs))
    gated = scored.filter((F.col("quality") >= 0.5) & (F.col("lang_pred") != "und"))
    deduped = drop_exact_dups(gated, "doc_id")
    out = fingerprint(token_stats(deduped))
    return out.select("doc_id", "lang_pred", "quality", "n_ws_tokens", "fp_exact")


def q_container_parse(spark, sf_dir):
    """container parser over synthesized docker-json / CRI lines (per-doc
    alternating format); invariant: recovered log == original text."""
    from ..operators.container import container_parser

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('{"log":"'), F.col("text"), F.lit('\\n","stream":"stdout","time":"2024-01-01T00:00:00Z"}')),
        )
        .otherwise(F.concat(F.lit("2024-01-01T00:00:00.000000000Z stderr F "), F.col("text")))
        .alias("line"),
    )
    out = container_parser(docs, "line")
    return out.select("doc_id", "container_format", "log_time", "stream", "partial_flag", "log")


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: MinHash+LSH pairs → connected components →
    (doc, cluster_rep). The actionable form of dedup: keep doc==rep."""
    from ..operators.dedup import dup_clusters, minhash_lsh_dedup_pairs

    pairs = minhash_lsh_dedup_pairs(_docs(spark, sf_dir), "doc_id", threshold=0.4)
    return dup_clusters(pairs)


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware near-dup winner: MinHash-LSH pairs → components →
    keep the LONGEST member of each cluster (n_chars score, ties → min
    id); singletons keep themselves."""
    from ..operators.dedup import dup_clusters, keep_best_per_cluster, minhash_lsh_dedup_pairs

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_dedup_pairs(d, "doc_id", threshold=0.4)
    return keep_best_per_cluster(d, dup_clusters(pairs), score_col="n_chars")


def q_emb_quantized(spark, sf_dir):
    """int8 scalar quantization of the embeddings table (storage path for
    the ANN candidate stage)."""
    from ..operators.similarity import quantize_embeddings

    q = quantize_embeddings(_embs(spark, sf_dir))
    return q.select(
        "vec_id",
        F.round("q_scale", 6).alias("q_scale"),
        F.array_join(F.transform(F.col("q_vec"), lambda x: x.cast("string")), ",").alias("q_csv"),
    )


def q_lineitem_pricing(spark, sf_dir):
    """The engine generalizes beyond telemetry: TPC-H Q1's pricing-summary
    shape expressed through the same operator surface (filter + hash
    aggregation with exact decimal accumulation) over the lineitem table —
    predicate pushdown + column pruning reach the scan exactly as in the
    log pipeline."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    # money/qty outputs stay DECIMAL(28,6): the input data has <=2 decimal
    # digits so the rescale is lossless, and the final exact-decimal ->
    # DOUBLE cast the old version used can differ by 1 ulp between engines
    # on large sums (observed at sf0.001)
    return (
        li.filter(F.col("l_shipdate").cast("timestamp") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("decimal(28,6)").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("decimal(28,6)").alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - d("l_discount"))).cast("decimal(28,6)").alias("sum_disc_price"),
            # avg as explicit exact-sum / count: engines' avg(decimal)
            # implementations differ (DuckDB goes through doubles)
            F.round(F.sum(d("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): the 3-table big-join pattern —
    filtered customer ⨝ orders ⨝ lineitem, revenue per order, top 10.
    Join strategy at 100 TB: customer/orders/lineitem all scale with the
    corpus, so BOTH joins are shuffle joins on their natural keys
    (custkey, orderkey) — no broadcast; the segment/date filters push to
    the scans and AQE right-sizes the post-filter shuffles. Exact decimal
    revenue, top-10 by (revenue DESC, orderkey) = one WindowGroupLimit."""
    cutoff = "1996-06-30"
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate").cast("timestamp") < cutoff
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate").cast("timestamp") > cutoff
    )
    d = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - d("l_discount")))
            .cast("decimal(28,6)")
            .alias("revenue")
        )
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): the star-join pattern with
    fixed-size dims — nation (25) and region (5) are BROADCAST (the only
    tables that stay small at any scale factor); customer, orders,
    lineitem, supplier shuffle on their keys. The c_nationkey ==
    s_nationkey "local" predicate rides the supplier join condition."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate").cast("timestamp") >= "1996-01-01")
        & (F.col("o_orderdate").cast("timestamp") < "1997-01-01")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    d = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - d("l_discount")))
            .cast("decimal(28,6)")
            .alias("revenue")
        )
    )


def q_lang_confusion(spark, sf_dir):
    """Confusion counts of the heuristic language-ID against the corpus
    labels — one row per observed (label, pred) pair."""
    from ..operators.curation import confusion_matrix
    from ..operators.textstats import lang_id

    scored = lang_id(_docs(spark, sf_dir))
    return confusion_matrix(scored, "lang", "lang_pred")


def q_lang_report(spark, sf_dir):
    """Per-class precision/recall/F1 + support for the language-ID — the
    sklearn classification_report shape, computed distributed; classes
    never predicted still report (precision NULL, recall 0)."""
    from ..operators.curation import classification_report
    from ..operators.textstats import lang_id

    scored = lang_id(_docs(spark, sf_dir))
    return classification_report(scored, "lang", "lang_pred")


def q_quantile_norm(spark, sf_dir):
    """Quantile-normalize per-source quality scores onto the global
    distribution (resolution 50) — 'top decile of source A' and 'top
    decile of source B' land on the same scale; integer-exact rank →
    ladder-bucket mapping, no float percent_rank boundary risk."""
    from ..operators.curation import quantile_normalize
    from ..operators.textstats import quality_score

    q = quality_score(_docs(spark, sf_dir)).select("doc_id", "source", "quality")
    return quantile_normalize(q, "quality", "source", "doc_id", resolution=50)


def q_corpus_gini(spark, sf_dir):
    """Gini coefficient of document-length mass per source — corpus
    inequality as one number per source; exact rank formulation."""
    from ..operators.profiling import gini_concentration

    return gini_concentration(_docs(spark, sf_dir), "n_chars", by=["source"])


def q_corpus_lorenz(spark, sf_dir):
    """Lorenz curve at decile resolution per source: cumulative share of
    character mass held by the bottom k/10 of documents."""
    from ..operators.profiling import lorenz_deciles

    return lorenz_deciles(_docs(spark, sf_dir), "n_chars", by=["source"])


def q_curation_allocation(spark, sf_dir):
    """Largest-remainder allocation of a 1000-doc eval budget across
    (source, lang) strata — Σ alloc == budget exactly, |alloc − quota| < 1,
    all integer arithmetic (div/mod, never a float floor)."""
    from ..operators.curation import proportional_allocation

    return proportional_allocation(_docs(spark, sf_dir), ["source", "lang"], 1000)


def q_mixture_ess(spark, sf_dir):
    """Kish effective sample size per source when documents are weighted
    by their quality score — the pre-training diagnostic for any weighted
    mixture: ess_frac near 0 means a few docs dominate. Weights quantized
    to decimal(18,9) so both power sums are order-insensitive."""
    from ..operators.curation import effective_sample_size
    from ..operators.textstats import quality_score

    scored = quality_score(_docs(spark, sf_dir))
    return effective_sample_size(scored, "quality", by=["source"])


def q_corpus_diversity(spark, sf_dir):
    """Token-distribution diversity per source: vocab, tokens, type-token
    ratio, unbiased Simpson concentration (integer-exact) and effective
    vocabulary — the template-spam / corpus-balance monitor."""
    from ..operators.textstats import diversity_indices

    return diversity_indices(_docs(spark, sf_dir), "source")


def q_text_phrase_pmi(spark, sf_dir):
    """Collocation mining by the word2phrase score over the documents
    corpus: top-50 bigrams whose joint count beats independence
    (min_count discounted). Counts-only arithmetic — engine-exact."""
    from ..operators.textstats import phrase_pmi

    return phrase_pmi(_docs(spark, sf_dir), min_count=5, top_k=50)


def q_text_chi2_keywords(spark, sf_dir):
    """Per-language distinctive terms by χ² over the presence×class 2×2
    table, top-10 enriched terms per language."""
    from ..operators.textstats import chi2_keywords

    return chi2_keywords(_docs(spark, sf_dir), "lang", top_k=10)


def q_corpus_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve at 10 corpus-prefix checkpoints
    (docs ordered by id): cumulative docs, tokens, and distinct vocab —
    one explode + min-per-token, never a per-checkpoint rescan."""
    from ..operators.textstats import vocab_growth

    return vocab_growth(_docs(spark, sf_dir))


def q_nb_lift_deciles(spark, sf_dir):
    """Calibration/lift table for the hashed-NB quality classifier:
    ntile(10) by (score DESC, doc_id), per-decile positive rate and
    cumulative gains. The eval artifact behind every keep-threshold
    choice; integer-exact so it cross-engine hashes."""
    from ..operators.curation import nb_hash_classifier, score_decile_lift

    d = _docs(spark, sf_dir).withColumn("label", F.col("lang") == "en")
    scored = nb_hash_classifier(d, label_col="label")
    return score_decile_lift(scored, "nb_score", "label")


def q_nb_auc(spark, sf_dir):
    """Exact ROC AUC of the NB classifier via the Mann-Whitney rank-sum
    identity with mid-rank tie correction — one sort + one aggregate, no
    P×N pairwise comparison. Ranks are half-integers (exactly
    representable doubles), so the sum is order-insensitive."""
    from ..operators.curation import auc_rank_sum, nb_hash_classifier

    d = _docs(spark, sf_dir).withColumn("label", F.col("lang") == "en")
    scored = nb_hash_classifier(d, label_col="label")
    return auc_rank_sum(scored, "nb_score", "label")


def q_corpus_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap CI for the corpus mean document length in ONE
    aggregation pass (Chamandy et al. 2012): 32 deterministic Poisson(1)
    weights per doc (portable-hash uniform inverted through the CDF), all
    replica (Σw·v, Σw) pairs in one agg row, SE from the replica means.
    The determinism is the point — the oracle re-derives the identical
    interval, and a rerun at 100 TB reproduces it without storing
    weights."""
    from ..operators.profiling import bootstrap_ci

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bootstrap_ci(docs, "doc_id", "n_chars", replicas=32)


def q_join_bloom_prune(spark, sf_dir):
    """Bloom-pruned selective join: lineitem (probe, corpus-scale) ⨝ the
    p_size=1 slice of part (build, selective). The build side's distinct
    keys fold into a ~k-bit-per-key bitmap in ONE aggregation; the probe is
    pruned SCAN-SIDE by an inlined-bitmap projection (zero Python, zero
    extra shuffle) before the real equi-join — at sf0.01 the exchange
    shrinks 60k → ~1.7k rows (fpp 1%). False positives survive to the join
    and die there, so the result is exactly the plain join — which is the
    oracle. Mirrors Spark's runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter.*) as an explicit, persistable
    operator; at 100 TB this is the shuffle-reduction move when the dim is
    too big to broadcast-hash-join but its key SET summarizes to a few MB."""
    from ..operators.enrich import bloom_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_size") == 1)
        .select("p_partkey", "p_name")
    )
    out = bloom_join(li, dim, "l_partkey", "p_partkey")
    return out.select("l_orderkey", "l_partkey", "l_quantity", "p_name")


def q_fk_summary(spark, sf_dir):
    """Cross-table referential integrity as a batch gate: one verdict row
    per declared FK. The TPC-H edges (lineitem→orders→customer→nation)
    are clean by construction; events.user_id→supplier.s_suppkey is
    deliberately violated (150 users, 100 suppliers) so the fail path is
    exercised. Each FK is one distinct-key anti join over only its key
    columns."""
    from ..plans.contracts import referential_summary

    t = {
        n: spark.read.parquet(f"{sf_dir}/{n}.parquet")
        for n in ("lineitem", "orders", "customer", "nation", "events", "supplier")
    }
    return referential_summary(
        t,
        [
            {"name": "lineitem_orders", "child": "lineitem", "parent": "orders",
             "on": {"l_orderkey": "o_orderkey"}},
            {"name": "orders_customer", "child": "orders", "parent": "customer",
             "on": {"o_custkey": "c_custkey"}},
            {"name": "customer_nation", "child": "customer", "parent": "nation",
             "on": {"c_nationkey": "n_nationkey"}},
            {"name": "events_supplier", "child": "events", "parent": "supplier",
             "on": {"user_id": "s_suppkey"}},
        ],
    )


def q_fk_orphan_rows(spark, sf_dir):
    """The row-level complement of fk_summary: WHICH child rows dangle.
    Anti join against the distinct parent key set; NULL FKs are exempt
    (SQL MATCH SIMPLE)."""
    from ..plans.contracts import fk_orphans

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return fk_orphans(ev, sup, {"user_id": "s_suppkey"}).select(
        "event_id", "user_id", "event_type"
    )


def q_ngram_spans(spark, sf_dir):
    from ..operators.dedup import duplicated_ngram_spans

    return duplicated_ngram_spans(_docs(spark, sf_dir), "doc_id", n=5, min_docs=2)


def q_remove_spans(spark, sf_dir):
    from ..operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(_docs(spark, sf_dir), "doc_id", n=5, min_docs=2)


def q_text_chunks(spark, sf_dir):
    from ..operators.textstats import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=16, overlap=4)


def _lined_docs(spark, sf_dir):
    """Line-structured view of documents: 4 lines per doc, two of them
    identical when doc_id%3==0, so duplicate-line stats have signal. Both
    engines synthesize the same bytes (chr(10) joins)."""
    d = _docs(spark, sf_dir)
    head = F.substring(F.col("text"), 1, 60)
    mid = F.substring(F.col("text"), 30, 40)
    dup = F.when(F.col("doc_id") % 3 == 0, head).otherwise(F.concat(mid, F.lit(" tail")))
    lined = F.concat_ws("\n", head, mid, dup, F.lit("footer line"))
    return d.select("doc_id", "source", lined.alias("text"))


def q_curation_repetition(spark, sf_dir):
    from ..operators.curation import repetition_stats

    out = repetition_stats(_lined_docs(spark, sf_dir))
    return out.select(
        "doc_id", "dup_line_frac", "top_bigram_frac", "symbol_word_ratio", "alpha_word_frac"
    )


def q_curation_gopher(spark, sf_dir):
    from ..operators.curation import gopher_filter

    out = gopher_filter(_lined_docs(spark, sf_dir))
    return out.select("doc_id", "gopher_pass")


def q_curation_url_filter(spark, sf_dir):
    """C4/RefinedWeb URL front gate: domain-suffix blocklist (broadcast
    DataFrame path — exploded suffix equi-join, blocked-subset-only
    shuffle) + badword pattern, over synthesized per-doc URLs including a
    suffix-trap domain (`bad.net.evil.io` must NOT match `bad.net`)."""
    from ..operators.curation import url_filter

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    domain = (
        F.when(i % 5 == 0, "ads.example.com")
        .when(i % 5 == 1, "example.com")
        .when(i % 5 == 2, "news.good.org")
        .when(i % 5 == 3, "bad.net.evil.io")
        .otherwise("fine.io")
    )
    fixture = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), domain, F.lit("/d/"), i.cast("string"),
            F.when(i % 11 == 0, F.lit("/casino/x")).otherwise(""),
        ).alias("url"),
    )
    blocked = spark.createDataFrame([("example.com",), ("bad.net",)], "domain string")
    out = url_filter(fixture, "url", blocked_domains=blocked, blocked_url_regex="/casino/")
    return out.select(
        "doc_id", "url", "uf_domain", "uf_blocked_domain", "uf_blocked_pattern", "uf_keep"
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed-ngram importance log-weights; target domain = src0 docs.
    Decimal-exact per-doc sums keep both engines bit-equal (the 64 bucket
    log-ratios round to 9 decimals before accumulation)."""
    from ..operators.curation import dsir_weights

    out = dsir_weights(_docs(spark, sf_dir), F.col("source") == "src0", n_buckets=64)
    return out.select("doc_id", "source", "dsir_logweight")


def q_train_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment by hash band."""
    from ..operators.curation import train_split

    out = train_split(_docs(spark, sf_dir), {"train": 0.9, "val": 0.05, "test": 0.05})
    return out.select("doc_id", "split")


def q_lm_quality(spark, sf_dir):
    """Bucketed-bigram LM quality score (mean conditional logprob per doc)."""
    from ..operators.curation import lm_quality_score

    out = lm_quality_score(_docs(spark, sf_dir), n_buckets=32)
    return out.select("doc_id", "lm_logprob")


def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity tiers per language: corpus-trained
    bucketed-bigram LM score, then ntile(3) within each language ordered by
    (score DESC NULLS LAST, doc_id). The exact/oracle path; the threshold
    path (broadcast per-language cut points, scan-speed) is pytest-gated."""
    from ..operators.curation import ccnet_buckets

    out = ccnet_buckets(_docs(spark, sf_dir), n_buckets=32)
    return out.select("doc_id", "lang", "lm_logprob", "ppl_bucket")


def q_nb_classifier(spark, sf_dir):
    """Hashed Naive-Bayes quality classifier (fastText-shaped): train
    per-bucket log-odds on the corpus with label = (lang == 'en'), then
    score every document — prior + Σ w[h60(token) % 256]; pred = score>0.
    Closed-form two-aggregation training, literal-array model apply."""
    from ..operators.curation import nb_hash_classifier

    d = _docs(spark, sf_dir).withColumn("label", F.col("lang") == "en")
    out = nb_hash_classifier(d, label_col="label")
    return out.select("doc_id", "lang", "nb_score", "nb_pred")


def q_bpe_encode(spark, sf_dir):
    """Tokenize every document with the 3 merges trained on the corpus
    itself (bpe_train drives 3 tiny argmax actions; bpe_apply compiles the
    merge chain into one codegen projection). The oracle re-derives the
    SAME merges with the per-round training CTEs and re-encodes every doc
    via the word dictionary — end-to-end train+apply parity."""
    from ..operators.bpe import bpe_apply, bpe_train

    docs = _docs(spark, sf_dir)
    # max_words=None: the SQL oracle folds the FULL word dictionary, so
    # the Spark side must train on it too — the bounded default would
    # silently diverge at a tier whose vocabulary exceeds the cap
    merges = bpe_train(docs, 3, max_words=None)
    out = bpe_apply(docs, merges)
    return out.select(
        "doc_id",
        F.nullif(F.array_join(F.col("bpe_tokens"), "\x1f"), F.lit("")).alias("tokens_sep"),
    )


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE vocabulary induction: 3 merge rounds over the
    documents word dict. Fully oracle-checked — each round (pair count,
    argmax with lexicographic tie-break, boundary-safe double-replace
    rewrite) is expressed identically in DuckDB."""
    from ..operators.bpe import bpe_merges_df

    out = bpe_merges_df(_docs(spark, sf_dir), 3)
    return out.select(
        F.col("rank").alias("merge_rank"),
        F.col("left").alias("lhs"),
        F.col("right").alias("rhs"),
        "merged",
        "pair_count",
    )


def q_curation_pii(spark, sf_dir):
    """PII scrub over text with deterministically injected email/IP/phone/
    SSN shapes (doc_id-derived, so every engine synthesizes identical
    bytes and the masks/counts must agree exactly)."""
    from ..operators.curation import pii_scrub

    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    injected = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" user"), did.cast("string"), F.lit("@example.com "),
        F.lit("10.0."), (did % 256).cast("string"), F.lit("."), ((did * 7) % 256).cast("string"),
        F.when(did % 2 == 0, F.concat(F.lit(" 555-01"), F.lpad((did % 10).cast("string"), 1, "0"), F.lit("-"), F.lpad((did % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.concat(F.lit(" 123-45-"), F.lpad((did % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
    )
    out = pii_scrub(d.select("doc_id", injected.alias("text")), "text")
    return out.select(
        "doc_id", "pii_email_count", "pii_ssn_count", "pii_ipv4_count", "pii_phone_count",
        F.col("text_scrubbed"),
    )


def q_curation_pack(spark, sf_dir):
    """Concat-and-chunk packing within source shards, budget 512 tokens."""
    from ..operators.curation import pack_sequences
    from ..operators.textstats import tokens as _tok

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(_tok(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    out = pack_sequences(d, budget=512, partition_cols=["source"])
    return out.select("doc_id", "source", "n_tokens", "pack_id", "pack_offset")


def q_curation_line_dedup(spark, sf_dir):
    """C4-style cross-document line dedup over the lined view: with
    min_df=2 every non-first occurrence of an eligible (≥3-word) repeated
    line is stripped — the within-doc duplicated head (doc_id%3==0
    stratum) and any cross-doc head/mid collisions; the 2-word 'footer
    line' is exempt and survives everywhere."""
    from ..operators.curation import dedup_lines_across_docs

    out = dedup_lines_across_docs(_lined_docs(spark, sf_dir))
    return out.select("doc_id", "text_deduped", "n_lines_removed")


def q_curation_mixture(spark, sf_dir):
    from ..operators.curation import mixture_sample

    d = _docs(spark, sf_dir)
    out = mixture_sample(
        d, rates={"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_rate=0.1
    )
    return out.select("doc_id", "source")


def q_tfidf_topk(spark, sf_dir):
    """Per-doc top-3 TF-IDF keywords (smoothed idf, term-text tiebreak)."""
    from ..operators.textstats import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=3).select(
        "doc_id", "term", "tf", "df", "score",
        F.col("rank").cast("int").alias("rank"),
    )


def q_corpus_summary(spark, sf_dir):
    """Per-source corpus report: counts, tokens, mean chars, dup fraction."""
    from ..operators.textstats import corpus_summary

    return corpus_summary(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 37 == 0 play the eval
    suite; every other doc is train. 3-gram overlap (short fixture docs;
    production n=13 per the GPT-3/Gopher protocol)."""
    from ..operators.curation import decontaminate

    d = _docs(spark, sf_dir)
    ev = d.filter(F.col("doc_id") % 37 == 0)
    tr = d.filter(F.col("doc_id") % 37 != 0)
    return decontaminate(tr, ev, n=3)


def q_decontaminate_fuzzy(spark, sf_dir):
    """Fuzzy (MinHash-LSH) decontamination: same % 37 eval/train split as
    the exact protocol, verified Jaccard >= 0.4 against any eval doc."""
    from ..operators.curation import decontaminate_fuzzy

    d = _docs(spark, sf_dir)
    ev = d.filter(F.col("doc_id") % 37 == 0)
    tr = d.filter(F.col("doc_id") % 37 != 0)
    return decontaminate_fuzzy(tr, ev, n=3, bands=4, rows=2, threshold=0.4)


def q_train_shuffle(spark, sf_dir):
    """Deterministic seeded training-order shuffle: 16 shards, seed 'r3'."""
    from ..operators.curation import train_shuffle

    d = _docs(spark, sf_dir)
    return train_shuffle(d, n_shards=16, seed="r3").select(
        "doc_id", "shard_id", "shard_pos"
    )


def q_cluster_balance(spark, sf_dir):
    """Cluster-balanced sampling: nearest-centroid cells (first-8 coarse
    quantizer, same as sim_topk_ivf), cap 40 per cell by seeded hash rank."""
    from ..operators.similarity import cluster_balance

    return cluster_balance(_embs(spark, sf_dir), cap=40, n_cells=8)


def q_contrastive_pairs(spark, sf_dir):
    """Contrastive training pairs mined from the embedding corpus:
    same-cell positives (cos >= 0.35, the near-dup band on this fixture)
    plus per-anchor top-3 hard negatives in [0.2, 0.35) — close but not
    duplicate, the bi-encoder decision-boundary examples."""
    from ..operators.similarity import mine_contrastive_pairs

    return mine_contrastive_pairs(
        _embs(spark, sf_dir), pos_threshold=0.35, neg_floor=0.2, k_negatives=3, n_cells=8
    )


def q_leakage_split(spark, sf_dir):
    """Leakage-safe 90/10 split: MinHash-LSH near-dup pairs → connected
    components → the whole duplicate cluster follows its representative's
    hash band, so near-dups never straddle train/test."""
    from ..operators.curation import leakage_safe_split
    from ..operators.dedup import minhash_lsh_dedup_pairs

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_dedup_pairs(d, "doc_id", threshold=0.4)
    out = leakage_safe_split(d, pairs, {"train": 0.9, "test": 0.1})
    return out.select("doc_id", "cluster_rep", "split")


def q_source_overlap(spark, sf_dir):
    """Cross-source duplication matrix over the corpus plus a mirrored
    stratum (doc_id % 3 == 0 re-labeled 'mirror_<source>' with identical
    text) so the fixture carries guaranteed cross-source duplicate mass."""
    from ..operators.textstats import source_overlap_matrix

    d = _docs(spark, sf_dir)
    mirrored = d.filter(F.col("doc_id") % 3 == 0).withColumn(
        "source", F.concat(F.lit("mirror_"), F.col("source"))
    )
    return source_overlap_matrix(d.unionByName(mirrored))


def q_data_recipe(spark, sf_dir):
    """Token-budget recipe execution: 2,000 tokens at 60/30/10 over
    src0/src1/src2 (each source holds ~1.4k tokens at sf0.01, so every
    target is a proper subset and the boundary rule is exercised)."""
    from ..operators.curation import data_recipe
    from ..operators.textstats import tokens as _tok

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(_tok(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    return data_recipe(
        d, weights={"src0": 0.6, "src1": 0.3, "src2": 0.1}, token_budget=2000
    )


def q_sft_examples(spark, sf_dir):
    """Transcript -> SFT (prompt, completion) pairs: one example per
    assistant turn, chat-template context from the 6 preceding turns
    (bounded frame), prompt left-truncated to its rightmost 400 chars so
    the rolling-context-window path is exercised on real rows."""
    from ..operators.sft import sft_examples

    return sft_examples(
        _transcripts(spark, sf_dir), max_context_turns=6, max_prompt_chars=400
    )


def q_preference_pairs(spark, sf_dir):
    """DPO pair construction over (user turn -> assistant reply) pairs:
    prompt key = first-4-token prefix of the user turn (the synthetic
    tier's stand-in for semantic prompt clustering), score = reply
    whitespace-token count (the verbosity baseline a reward model
    replaces via the pluggable score column)."""
    from pyspark.sql import Window

    from ..operators.sft import preference_pairs
    from ..operators.textstats import tokens

    t = _transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc(), F.col("ts").asc())
    o = t.select(
        "role",
        "text",
        F.lag("role").over(w).alias("_prev_role"),
        F.lag("text").over(w).alias("_prev_text"),
    ).where((F.col("role") == "assistant") & (F.col("_prev_role") == "user"))
    pairs = o.select(
        F.concat_ws(" ", F.slice(tokens(F.col("_prev_text")), 1, 4)).alias("prompt_key"),
        F.col("text").alias("completion"),
        F.size(tokens(F.col("text"))).cast("double").alias("score"),
    )
    return preference_pairs(pairs)


def q_length_batches(spark, sf_dir):
    """Padding-efficiency batching over the documents table: ws-token
    counts, per-source shards (the at-scale window key), 16-row batches
    in deterministic doc_id order within each (source, bucket)."""
    from ..operators.curation import length_bucketed_batches
    from ..operators.textstats import tokens

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    return length_bucketed_batches(
        d, batch_size=16, partition_cols=["source"]
    )


def q_sft_masked_sequence(spark, sf_dir):
    """Transcript -> per-conversation packed sequence + char-span loss
    mask over assistant turns (offsets from a running-length window, the
    whole construction pinned by seq_md5)."""
    from ..operators.sft import conversation_masked_sequence

    return conversation_masked_sequence(_transcripts(spark, sf_dir))


def q_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per doc (gibberish /
    binary-blob detector) — one zero-shuffle fold projection."""
    from ..operators.textstats import char_entropy

    return char_entropy(_docs(spark, sf_dir)).select("doc_id", "char_entropy")


def q_c4_line_filter(spark, sf_dir):
    """C4-style line-level cleaning: keep prose-looking lines, rewrite the
    doc, and apply the page-level lorem-ipsum/brace/min-lines verdict."""
    from ..operators.curation import c4_line_filter

    return c4_line_filter(_docs(spark, sf_dir)).select(
        "doc_id", "text_clean", "n_lines_kept", "n_lines_dropped", "c4_pass"
    )


def q_turn_latency(spark, sf_dir):
    """Assistant response latency: for every assistant turn whose previous
    turn (by turn_idx, ts within the conversation) was a user turn, the
    microsecond delta to that user turn — integer-exact, one exchange."""
    from ..operators.timeseries import lag_delta

    t = lag_delta(
        _transcripts(spark, sf_dir),
        ["conv_id"],
        ["turn_idx", "ts"],
        "ts",
        carry_cols=["role"],
    )
    return t.filter(
        (F.col("role") == "assistant") & (F.col("prev_role") == "user")
    ).select("conv_id", "turn_idx", "tool", "delta_us")


def q_context_budget(spark, sf_dir):
    """Context-window accounting: running whitespace-token total per
    conversation up to and including each turn, plus the over-budget flag
    at 2000 tokens — the truncation-point signal for context packing."""
    from ..operators.textstats import tokens
    from ..operators.timeseries import running_sum

    out = running_sum(
        _transcripts(spark, sf_dir),
        ["conv_id"],
        ["turn_idx", "ts"],
        F.size(tokens(F.col("text"))).cast("bigint"),
        out_col="cum_tokens",
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "cum_tokens",
        (F.col("cum_tokens") > 2000).alias("over_budget"),
    )


def q_tool_retry_chains(spark, sf_dir):
    """Consecutive tool-failure runs (gaps-and-islands over stable turn
    order) with the recovered-on-next-call verdict per chain."""
    from ..operators.conv_qa import tool_retry_chains

    return tool_retry_chains(_transcripts(spark, sf_dir))


def q_role_sequence_qa(spark, sf_dir):
    """Role-protocol validation per conversation: double-assistant,
    orphan-tool, bad-open counts + the qa_pass verdict."""
    from ..operators.conv_qa import role_sequence_qa

    return role_sequence_qa(_transcripts(spark, sf_dir))


def q_conv_exact_dedup(spark, sf_dir):
    """Conversation-level dedup digest (ordered fold of per-turn md5s)
    with duplicate-group size / keeper / is_dup for every conversation."""
    from ..operators.conv_qa import conv_exact_dedup

    return conv_exact_dedup(_transcripts(spark, sf_dir))


def q_conv_self_repetition(spark, sf_dir):
    """Within-conversation repeated turn text — stuck-agent loops."""
    from ..operators.conv_qa import conv_self_repetition

    return conv_self_repetition(_transcripts(spark, sf_dir))


def q_transcript_curation_gate(spark, sf_dir):
    """Composite per-conversation eligibility verdict: role protocol +
    dedup keeper + retry-chain caps joined into one gate row."""
    from ..operators.conv_qa import transcript_curation_gate

    return transcript_curation_gate(_transcripts(spark, sf_dir))


def q_conv_gate_incremental(spark, sf_dir):
    """Incremental refresh parity: simulate an append (the final turn of
    every conversation whose id ends in 0-3 arrives as the delta batch),
    carry prior state for untouched convs, and return the refreshed
    verdicts — which must equal the full recompute (the oracle is the
    same SQL as conv_curation_gate)."""
    from pyspark.sql import Window

    from ..operators.conv_qa import curation_gate_incremental, curation_gate_state

    t = _transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id")
    mx = t.withColumn("_mx", F.max("turn_idx").over(w))
    touched = F.substring("conv_id", -1, 1).isin("0", "1", "2", "3")
    is_new = touched & (F.col("turn_idx") == F.col("_mx"))
    delta = mx.filter(is_new).drop("_mx")
    old = mx.filter(~is_new).drop("_mx")
    prior = curation_gate_state(old)
    _, verdicts = curation_gate_incremental(t, delta, prior)
    return verdicts


def q_pack_conversations(spark, sf_dir):
    """Conversation-aware next-fit packing: whole conversations into
    2000-token windows per shard (never split mid-dialogue); oracle is a
    per-shard linear recursive CTE replaying the same next-fit."""
    from ..operators.curation import pack_conversations

    return pack_conversations(_transcripts(spark, sf_dir), budget=2000)


def q_conv_role_drift(spark, sf_dir):
    """Categorical PSI of the role mix: February+ vs January traffic —
    did the role distribution of incoming transcripts change shape?"""
    from ..operators.drift import psi_drift_categorical

    return psi_drift_categorical(
        _transcripts(spark, sf_dir),
        F.col("role"),
        F.col("ts") >= F.lit("2025-02-01").cast("timestamp"),
        feature_name="role",
    )


def q_bm25_search(spark, sf_dir):
    """BM25 top-10 retrieval: the 5 lowest-id documents' first 8 tokens
    serve as deterministic queries against the whole corpus."""
    from ..operators.textstats import bm25_search, tokens

    docs = _docs(spark, sf_dir)
    qs = (
        docs.orderBy("doc_id")
        .limit(5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)).alias("query_text"),
        )
    )
    return bm25_search(docs, qs, top_k=10)


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical top-10 + dense cosine top-10 fused
    with reciprocal-rank fusion (k0=60) — the 5 lowest-id documents serve
    as queries on both sides (text = their first 8 tokens, vector = their
    aligned embedding). Output: fused top-10 per query."""
    from ..operators.similarity import brute_force_topk, rrf_fuse
    from ..operators.textstats import bm25_search, tokens

    docs = _docs(spark, sf_dir)
    qs = (
        docs.orderBy("doc_id")
        .limit(5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)).alias("query_text"),
        )
    )
    lex = bm25_search(docs, qs, top_k=10)
    emb = _embs(spark, sf_dir)
    qd = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = brute_force_topk(emb, qd, k=10).withColumnRenamed("neighbor_id", "doc_id")
    return rrf_fuse([lex.select("query_id", "doc_id", "rank"),
                     dense.select("query_id", "doc_id", "rank")], top_k=10)


def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over events: quasi-identifiers = (event_type,
    hour-of-day, value decade band), sensitive = user_id. One class row
    with size, l-diversity and the k<5 risk flag — the release gate run
    after PII scrubbing."""
    from ..operators.curation import k_anonymity_audit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).alias("hr"),
        F.floor(F.col("value") / 10).alias("value_band"),
        "user_id",
    )
    return k_anonymity_audit(
        ev, ["event_type", "hr", "value_band"], sensitive_col="user_id", k=5
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature-flattened language mixture (alpha=0.5, corpus-size-
    preserving): English (the head language) is downsampled below rate 1,
    tail languages repeat whole epochs plus a deterministic hash-gated
    fractional slice. Output one row per KEPT COPY with its copy index."""
    from ..operators.curation import temperature_mixture_rates, upsample_repeat

    d = _docs(spark, sf_dir)
    rates = temperature_mixture_rates(d, alpha=0.5, domain_col="lang")
    out = upsample_repeat(d, rates, domain_col="lang")
    return out.select("doc_id", "lang", "copy_idx")


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus sample: 200 documents drawn by the
    deterministic A-ES rule with weight = doc length in chars."""
    from ..operators.curation import weighted_sample

    d = _docs(spark, sf_dir)
    out = weighted_sample(d, F.col("n_chars").cast("double"), 200)
    return out.select("doc_id", "sample_rank")


def q_rl_transitions(spark, sf_dir):
    """Agent-RL trajectory tuples: (step, action, reward, done) per tool
    call with a bounded previous-turn state digest."""
    from ..operators.conv_qa import rl_transitions

    return rl_transitions(_transcripts(spark, sf_dir))


def q_ngram_novelty(spark, sf_dir):
    """Memorization-risk score per document: fraction of its distinct
    3-gram hashes appearing in more than 2 documents corpus-wide."""
    from ..operators.textstats import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir), n=3, common_df=2)


def q_transcript_contract(spark, sf_dir):
    """Ingest data contract over the transcript table: six checks in one
    aggregate pass (plans/contracts.py)."""
    from ..plans.contracts import transcript_contract, validate_contract

    return validate_contract(_transcripts(spark, sf_dir), transcript_contract())


def q_conv_funnel(spark, sf_dir):
    """Conversation funnel: user -> assistant -> tool progression per
    conversation under stable turn order (funnel_steps over roles, keyed
    on conv_id with turn_idx micro-ordering via ts)."""
    from ..operators.timeseries import funnel_steps

    return funnel_steps(
        _transcripts(spark, sf_dir),
        ["user", "assistant", "tool"],
        key_col="conv_id",
        ts_col="ts",
        type_col="role",
    )


def q_hashed_features(spark, sf_dir):
    """Hashing-trick featurizer: sparse (doc, bucket, tf) rows over a
    256-bucket token hash space — the model-free vectorizer feeding
    clustering/classifiers; shuffle key is a small int."""
    from ..operators.textstats import h60, tokens

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    return (
        toks.select("doc_id", F.pmod(h60(F.col("tok")), F.lit(256)).cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def q_turn_boilerplate(spark, sf_dir):
    """Cross-conversation repeated turn text (boilerplate digests)."""
    from ..operators.conv_qa import turn_boilerplate

    return turn_boilerplate(_transcripts(spark, sf_dir))


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction (the C4/RefinedWeb markup-strip stage):
    deterministic HTML wrapping of the corpus (script/style/comment
    chrome, entity-escaped body, per-doc inline-anchor and
    unclosed-tag variants), then the native codegen extraction chain —
    text with line structure, decoded entities, title, link count."""
    from ..operators.html_extract import extract_html_text, synthesize_html_docs

    d = synthesize_html_docs(_docs(spark, sf_dir))
    return extract_html_text(d).select("doc_id", "html_text", "html_title", "n_links")


def q_jpeg_meta(spark, sf_dir):
    """REAL JPEG header decode: synthesized JFIF byte streams (variable
    APP segments, SOF0/SOF2 frames, a truncated-corrupt variant every
    13th doc) walked marker-by-marker for dimensions/components/
    progressive class — the decode-free metadata pass a multimodal
    pipeline runs on every crawled image."""
    from ..operators.multimodal import decode_jpeg_meta, synthesize_jpeg

    d = synthesize_jpeg(_docs(spark, sf_dir).select("doc_id"))
    m = decode_jpeg_meta(d)
    return m.select(
        "doc_id",
        F.col("jpeg_meta.valid").alias("jp_valid"),
        F.col("jpeg_meta.width").alias("jp_width"),
        F.col("jpeg_meta.height").alias("jp_height"),
        F.col("jpeg_meta.components").alias("jp_components"),
        F.col("jpeg_meta.precision").alias("jp_precision"),
        F.col("jpeg_meta.progressive").alias("jp_progressive"),
    )


_DC_HOSTS = (
    "news.example.com", "blog.example.com", "shop.example.co.uk",
    "sub.project.github.io", "example.com", "co.uk", "node7.internal-corp",
)


def q_domain_cap(spark, sf_dir):
    """Per-registrable-domain corpus cap: deterministic URLs over seven
    host shapes (known suffix, multi-label suffix, PSL wildcard default,
    bare public suffix), eTLD+1 via the literal-array suffix projection,
    then keep <=100 docs per domain ordered by doc_id."""
    from ..operators.curation import domain_cap

    d = _docs(spark, sf_dir).select("doc_id")
    host = F.element_at(
        F.array(*[F.lit(h) for h in _DC_HOSTS]),
        (F.pmod(F.col("doc_id"), F.lit(7)) + 1).cast("int"),
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("doc_id").cast("string"))
    d = d.withColumn("url", url).withColumn(
        "host", F.lower(F.expr("try_parse_url(url, 'HOST')"))
    )
    out = domain_cap(d, "host", cap=100, order_col="doc_id")
    return out.select("doc_id", "rd_domain", "dc_keep")


def q_canon_text(spark, sf_dir):
    """Unicode canonicalization for dedup keys: the corpus decorated with
    the crawl-duplicate classes (decomposed combining accents, case
    variance, ragged ASCII whitespace) must canonicalize to one form —
    NFC + lower + whitespace fold, with the portable h60 as the key."""
    from ..operators.curation import canonicalize_text
    from ..operators.textstats import h60

    d = _docs(spark, sf_dir).select("doc_id", "text")
    decorated = F.concat(
        F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
        F.lit("  Café \t No"),
        F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
        F.lit("  "),
    )
    out = canonicalize_text(d.withColumn("decorated", decorated), "decorated")
    return out.select("doc_id", "canon_text", h60(F.col("canon_text")).alias("canon_key"))


_ROBOTS_RULES = (
    ("example.com", "/private", False),
    ("example.com", "/private/archive", True),
    ("example.co.uk", "/", False),
    ("project.github.io", "/tmp", False),
)

_RG_PATHS = ("/public/x", "/private/doc", "/private/archive/old", "/tmp/cache", "/")


def q_robots_gate(spark, sf_dir):
    """Crawl-compliance gate: hosts resolve to registrable domains, then
    robots (domain, prefix, allow) rules apply with RFC 9309 longest-match
    semantics (most specific rule wins; allow wins ties) — allow-override
    inside a disallowed subtree included. Unattributable hosts pass."""
    from ..operators.curation import registrable_domain, robots_gate

    d = _docs(spark, sf_dir).select("doc_id")
    host = F.element_at(
        F.array(*[F.lit(h) for h in _DC_HOSTS]),
        (F.pmod(F.col("doc_id"), F.lit(7)) + 1).cast("int"),
    )
    path = F.element_at(
        F.array(*[F.lit(p) for p in _RG_PATHS]),
        (F.pmod(F.col("doc_id"), F.lit(5)) + 1).cast("int"),
    )
    d = registrable_domain(d.withColumn("host", host).withColumn("path", path), "host")
    rules = spark.createDataFrame(list(_ROBOTS_RULES), "domain string, prefix string, allow boolean")
    out = robots_gate(d, "rd_domain", "path", rules)
    return out.select("doc_id", "rd_domain", "path", "rg_allow", "rg_rule")


def q_zorder_key(spark, sf_dir):
    """Morton (Z-order) clustering key over two event dimensions — the
    multi-dimensional file-layout key (Iceberg/Delta ZORDER BY shape):
    clamp + shift quantization, bit interleave, pure codegen."""
    from ..operators.zorder import zorder_key

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    c1 = F.pmod(F.col("user_id"), F.lit(2048))
    c2 = F.pmod(F.col("event_id"), F.lit(2048))
    return ev.select(
        "event_id",
        zorder_key([c1, c2], [(0, 2047), (0, 2047)], bits=10).alias("z_key"),
    )


def q_heavy_hitters(spark, sf_dir):
    """EXACT token heavy hitters (> 2% corpus frequency) via the
    Misra-Gries candidates -> single collapsed-key recount pattern: the
    shuffle carries at most |candidates|+1 keys, never the vocabulary."""
    from ..operators.sketches import heavy_hitters
    from ..operators.textstats import tokens

    toks = _docs(spark, sf_dir).select(F.explode(tokens(F.col("text"))).alias("item"))
    return heavy_hitters(toks, "item", 0.02)


def q_containment_pairs(spark, sf_dir):
    """Directed sub-document duplication: containment |A∩B|/|A| >= 0.5
    over 3-gram shingles — catches the quote-inside-a-bigger-page case
    whose Jaccard sits below any resemblance threshold."""
    from ..operators.dedup import containment_pairs

    return containment_pairs(_docs(spark, sf_dir), "doc_id", threshold=0.5)


def q_key_skew(spark, sf_dir):
    """Pre-join skew diagnostic over events.user_id: top-20 keys with
    their corpus share and multiple of the uniform-key expectation."""
    from ..operators.profiling import key_skew_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return key_skew_profile(ev, ["user_id"], top_n=20)


def q_column_profile(spark, sf_dir):
    """ANALYZE-shape column statistics for the documents table: per-column
    null/distinct counts and average rendered width, one scan."""
    from ..operators.profiling import column_profile

    return column_profile(
        _docs(spark, sf_dir), ["doc_id", "text", "lang", "source", "n_chars"]
    )


def q_json_path_profile(spark, sf_dir):
    """Schema-on-read JSON inventory: synthesize a nested JSON payload per
    document (the registry's encode→decode convention — conditional keys,
    arrays, nulls, and a malformed 1-in-13 slice), then profile every
    (path, type) with the Arrow-batched walker. Oracle recomputes the
    expected counts from the synthesis parameters."""
    from ..operators.profiling import json_path_profile

    d = _docs(spark, sf_dir)
    full = F.concat(
        F.lit('{"id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "meta": {"lang": "'),
        F.col("lang"),
        F.lit('", "source": "'),
        F.col("source"),
        F.lit('"}, "tags": ["a", "b"], "score": '),
        F.col("n_chars").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(', "opt": {"deep": true}')).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(', "note": null')).otherwise(F.lit("")),
        F.lit("}"),
    )
    payload = F.when(F.col("doc_id") % 13 == 0, F.lit('{"broken": ')).otherwise(full)
    return json_path_profile(d.select(payload.alias("payload")), "payload")


def q_url_canonical(spark, sf_dir):
    """Crawl URL canonicalization over five deterministic variants per
    doc (case/port/fragment/tracking-param/param-order noise + one
    scheme-less unparseable) — variants of the same page collapse to one
    url_key; the scheme-less row keys NULL."""
    from ..operators.curation import canonicalize_url

    d = _docs(spark, sf_dir).select("doc_id")
    page = F.pmod(F.col("doc_id"), F.lit(97)).cast("string")
    variants = F.array(
        F.concat(F.lit("http://example.com/p/"), page),
        F.concat(F.lit("HTTP://EXAMPLE.com:80/p/"), page, F.lit("#frag")),
        F.concat(F.lit("http://example.com/p/"), page, F.lit("?utm_source=x&utm_medium=y")),
        F.concat(F.lit("http://example.com/p/"), page, F.lit("?b=2&a=1&gclid=z")),
        F.concat(F.lit("example.com/p/"), page),
    )
    d = d.withColumn(
        "url", F.element_at(variants, (F.pmod(F.col("doc_id"), F.lit(5)) + 1).cast("int"))
    )
    return canonicalize_url(d).select("doc_id", "url", "canonical_url", "url_key")


def q_cluster_sizes(spark, sf_dir):
    """Duplication-factor histogram: what fraction of the corpus exists in
    N copies — MinHash-LSH pairs → CC → per-size cluster counts, with
    unpaired docs counted as singleton clusters (corpus-denominated)."""
    from ..operators.dedup import dup_cluster_sizes, minhash_lsh_dedup_pairs

    d = _docs(spark, sf_dir)
    pairs = minhash_lsh_dedup_pairs(d, "doc_id", threshold=0.4)
    return dup_cluster_sizes(d, pairs)


_SNIFF_HEX = [
    "89504E470D0A1A0A0000000D49484452",  # png
    "FFD8FFE000104A46494600",  # jpeg/JFIF
    "474946383961AAAA",  # gif89a
    "255044462D312E37",  # %PDF-1.7
    "1F8B08000000000000",  # gzip
    "504B030414000000",  # zip
    "7F454C4602010100",  # elf
    "4944330400000000",  # mp3 ID3
    "524946460000002457415645666D7420",  # riff/wav
    "52494646000000245745425056503820",  # riff/webp
    "DEADBEEF00112233",  # unknown
]

_SNIFF_WANT = [
    "image/png",
    "image/jpeg",
    "image/gif",
    "application/pdf",
    "application/gzip",
    "application/zip",
    "application/x-elf",
    "audio/mpeg",
    "audio/wav",
    "image/webp",
    "application/octet-stream",
]


def q_sniff_content_type(spark, sf_dir):
    """Magic-byte MIME sniffing over real synthesized binary payloads
    (12 variants per doc incl. RIFF wav/webp disambiguation, an unknown
    blob and a NULL payload); oracle = ground truth from the variant id."""
    from ..operators.multimodal import sniff_content_type

    d = _docs(spark, sf_dir).select("doc_id")
    v = F.pmod(F.col("doc_id"), F.lit(12))
    hexes = F.array(*[F.lit(h) for h in _SNIFF_HEX])
    payload = F.when(v < 11, F.unhex(F.element_at(hexes, (v + 1).cast("int"))))
    out = sniff_content_type(d.withColumn("payload", payload))
    return out.select("doc_id", "content_type")


def q_strata_sample(spark, sf_dir):
    """Deterministic 5-per-(source, length-bucket) eval sample via the
    hash-ordered equal-weights A-ES rule; short strata return whole."""
    from ..operators.curation import stratified_sample

    d = _docs(spark, sf_dir).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / F.lit(100))
    )
    return stratified_sample(d, ["source", "len_bucket"], k=5).select(
        "doc_id", "source", "len_bucket", "strata_rank"
    )


def q_events_window_diff(spark, sf_dir):
    """Top-movers table over (event_type, user-bucket) keys between the
    morning (reference) and afternoon (current) event windows: one hash
    agg, new/gone/grew/shrank verdict + ratio per key, noise floor 3."""
    from ..operators.drift import window_diff

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    keyed = ev.select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(50)).alias("user_bucket"),
        "ts",
    )
    return window_diff(
        keyed, ["event_type", "user_bucket"], F.hour(F.col("ts")) >= 12, min_total=3
    )


def q_embedding_drift(spark, sf_dir):
    """Embedding-space drift: centroid cosine between the even-id
    (current) and odd-id (reference) halves of each of three vector
    groups — the re-index-the-ANN-before-recall-decays check."""
    from ..operators.drift import embedding_drift

    e = _embs(spark, sf_dir).withColumn(
        "grp_id",
        F.concat(F.lit("g"), F.pmod(F.col("vec_id"), F.lit(3)).cast("string")),
    )
    return embedding_drift(e, "grp_id", F.pmod(F.col("vec_id"), F.lit(2)) == 0)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "conv_turn_latency": q_turn_latency,
    "conv_context_budget": q_context_budget,
    "conv_tool_retry_chains": q_tool_retry_chains,
    "conv_role_sequence_qa": q_role_sequence_qa,
    "conv_exact_dedup": q_conv_exact_dedup,
    "conv_self_repetition": q_conv_self_repetition,
    "conv_turn_boilerplate": q_turn_boilerplate,
    "html_text_extract": q_html_extract,
    "heavy_hitters_tokens": q_heavy_hitters,
    "multimodal_jpeg_meta": q_jpeg_meta,
    "curation_domain_cap": q_domain_cap,
    "zorder_key_events": q_zorder_key,
    "text_canonical_key": q_canon_text,
    "curation_robots_gate": q_robots_gate,
    "conv_curation_gate": q_transcript_curation_gate,
    "conv_gate_incremental": q_conv_gate_incremental,
    "conv_pack": q_pack_conversations,
    "conv_role_drift": q_conv_role_drift,
    "bm25_search": q_bm25_search,
    "hybrid_search_rrf": q_hybrid_search,
    "privacy_k_anonymity": q_k_anonymity,
    "curation_temperature_mix": q_temperature_mix,
    "curation_weighted_sample": q_weighted_sample,
    "conv_rl_transitions": q_rl_transitions,
    "text_ngram_novelty": q_ngram_novelty,
    "transcript_contract": q_transcript_contract,
    "conv_funnel": q_conv_funnel,
    "text_hashed_features": q_hashed_features,
    "text_char_entropy": q_char_entropy,
    "curation_c4_lines": q_c4_line_filter,
    "sft_examples": q_sft_examples,
    "sft_masked_sequence": q_sft_masked_sequence,
    "preference_pairs": q_preference_pairs,
    "length_bucketed_batches": q_length_batches,
    "text_tfidf_topk": q_tfidf_topk,
    "corpus_summary": q_corpus_summary,
    "curation_decontaminate": q_decontaminate,
    "curation_decontaminate_fuzzy": q_decontaminate_fuzzy,
    "curation_train_shuffle": q_train_shuffle,
    "cluster_balanced_sample": q_cluster_balance,
    "curation_repetition": q_curation_repetition,
    "curation_gopher": q_curation_gopher,
    "curation_url_filter": q_curation_url_filter,
    "curation_dsir_weights": q_dsir_weights,
    "bpe_train_merges": q_bpe_merges,
    "bpe_encode_docs": q_bpe_encode,
    "curation_lm_quality": q_lm_quality,
    "curation_ccnet_buckets": q_ccnet_buckets,
    "curation_nb_classifier": q_nb_classifier,
    "curation_train_split": q_train_split,
    "curation_pii_scrub": q_curation_pii,
    "curation_pack": q_curation_pack,
    "curation_mixture": q_curation_mixture,
    "curation_line_dedup": q_curation_line_dedup,
    "dedup_ngram_spans": q_ngram_spans,
    "dedup_span_removal": q_remove_spans,
    "text_chunks": q_text_chunks,
    "emb_quantized": q_emb_quantized,
    "lineitem_pricing_summary": q_lineitem_pricing,
    "tpch_shipping_priority": q_tpch_q3,
    "tpch_local_supplier_volume": q_tpch_q5,
    "corpus_bootstrap_ci": q_corpus_bootstrap_ci,
    "nb_lift_deciles": q_nb_lift_deciles,
    "curation_quantile_norm": q_quantile_norm,
    "lang_confusion": q_lang_confusion,
    "lang_report": q_lang_report,
    "corpus_gini": q_corpus_gini,
    "corpus_lorenz": q_corpus_lorenz,
    "curation_allocation": q_curation_allocation,
    "mixture_ess": q_mixture_ess,
    "corpus_diversity": q_corpus_diversity,
    "text_phrase_pmi": q_text_phrase_pmi,
    "text_chi2_keywords": q_text_chi2_keywords,
    "corpus_vocab_growth": q_corpus_vocab_growth,
    "nb_auc": q_nb_auc,
    "join_bloom_prune": q_join_bloom_prune,
    "fk_summary": q_fk_summary,
    "fk_orphan_rows": q_fk_orphan_rows,
    "curation_e2e": q_curation_e2e,
    "container_parse": q_container_parse,
    "dedup_near_clusters": q_dedup_clusters,
    "dedup_keep_best": q_dedup_keep_best,
    "text_token_stats": q_token_stats,
    "text_quality": q_quality,
    "text_lang_id": q_lang_id,
    "text_fingerprint": q_fingerprint,
    "dedup_exact_docs": q_dedup_exact,
    "dedup_jaccard_pairs": q_jaccard_pairs,
    "dedup_containment_pairs": q_containment_pairs,
    "dedup_cluster_sizes": q_cluster_sizes,
    "profile_key_skew": q_key_skew,
    "profile_columns": q_column_profile,
    "profile_json_paths": q_json_path_profile,
    "curation_url_canonical": q_url_canonical,
    "curation_strata_sample": q_strata_sample,
    "multimodal_sniff": q_sniff_content_type,
    "events_window_diff": q_events_window_diff,
    "embedding_drift": q_embedding_drift,
    "dedup_minhash_lsh_pairs": q_minhash_lsh_pairs,
    "dedup_exact_incremental": q_dedup_exact_incremental,
    "dedup_keep_first": q_dedup_keep_first,
    "dedup_keep_first_incremental": q_dedup_keep_first_incremental,
    "dedup_simhash_pairs": q_simhash_pairs,
    "multimodal_png_dhash": q_multimodal_dhash,
    "multimodal_dhash_pairs": q_multimodal_dhash_pairs,
    "dedup_embedding_pairs": q_embedding_dup_pairs,
    "dedup_embedding_pairs_bucketed": q_embedding_dup_pairs_bucketed,
    "dedup_semantic": q_semantic_dedup,
    "sim_recall_ivf": q_sim_recall_ivf,
    "sim_recall_ivfpq": q_sim_recall_ivfpq,
    "sim_topk_brute": q_topk_brute,
    "sim_topk_ivf": q_topk_ivf,
    "emb_pq_codes": q_pq_codes,
    "sim_topk_pq": q_topk_pq,
    "sim_topk_ivfpq": q_topk_ivfpq,
    "text_dict_tags": q_text_dict_tags,
    "emb_contrastive_pairs": q_contrastive_pairs,
    "leakage_split_docs": q_leakage_split,
    "source_overlap": q_source_overlap,
    "curation_recipe": q_data_recipe,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_wav_decode": q_multimodal_wav,
    "multimodal_wav_windows": q_multimodal_wav_windows,
    "multimodal_png_decode": q_multimodal_png,
}

# ---------------------------------------------------------------------------
# oracles (DuckDB SQL) — same algorithms, same rounding
# ---------------------------------------------------------------------------

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_STOP_RE = r"\b(?:the|a|and|of|to|in|is|it|that|for)\b"
_LANG_MARKERS = {
    "en": r"\b(?:the|and|of|to|is|was|with)\b",
    "de": r"\b(?:der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(?:le|la|les|et|est|pas|avec)\b",
    "es": r"\b(?:el|los|las|y|es|no|con)\b",
}


def _minhash_sig_sql(bands: int = 4, rows: int = 2) -> str:
    cols = []
    for b in range(bands):
        for r in range(rows):
            salted = "'" + f"{b}:{r}:" + "' || shingle"
            cols.append(f"min({sql_h60(salted)}) AS mh_{b}_{r}")
    return f"sig AS (SELECT doc, {', '.join(cols)} FROM shing GROUP BY doc)"


def _lsh_bucket_sql(bands: int = 4, rows: int = 2) -> str:
    parts = [
        f"SELECT doc, {b} AS band, concat_ws('-', {', '.join(f'CAST(mh_{b}_{r} AS VARCHAR)' for r in range(rows))}) AS bucket FROM sig"
        for b in range(bands)
    ]
    return "buckets AS (" + " UNION ALL ".join(parts) + ")"


def _oracles() -> dict[str, str]:
    from .transcript_sql import T2_TRANSCRIPTS

    o: dict[str, str] = {}

    # chat-template render shared by the SFT oracles (operators/sft.py
    # render_turn: <|role|>\n{text}\n<|end|>\n, NULLs render empty)
    _sft_cte = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text, ts,
    '<|' || coalesce(role, '') || '|>' || chr(10)
         || coalesce(text, '') || chr(10) || '<|end|>' || chr(10) AS r
  FROM read_parquet('{T2_TRANSCRIPTS}')
)
"""

    o["sft_examples"] = (
        _sft_cte
        + f"""
, w AS (
  SELECT conv_id, turn_idx, role, text,
    string_agg(r, '') OVER win AS ctx,
    count(*) OVER win AS nctx
  FROM t
  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx, ts
                 ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
), p AS (
  SELECT conv_id, turn_idx, role, text, nctx,
    CASE WHEN length(ctx) > 400
         THEN substr(ctx, length(ctx) - 399, 400) ELSE ctx END AS prompt
  FROM w
)
SELECT conv_id, turn_idx,
  CAST(nctx AS BIGINT) AS n_context_turns,
  prompt,
  text AS completion,
  CAST(length(prompt) AS BIGINT) AS prompt_chars,
  CAST(len({SQL_TOKS}) AS BIGINT) AS completion_tokens
FROM p WHERE role = 'assistant' AND nctx >= 1"""
    )

    o["length_bucketed_batches"] = f"""
WITH d AS (SELECT doc_id, source, CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens FROM documents),
b AS (
  SELECT *,
    CAST(coalesce(list_min(list_filter([64, 128, 256, 512, 1024],
                                       e -> e >= n_tokens)), 1024) AS BIGINT) AS bucket_cap,
    n_tokens > 1024 AS truncated
  FROM d
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source, bucket_cap ORDER BY doc_id) - 1 AS rk
  FROM b
)
SELECT doc_id, source, n_tokens, bucket_cap, truncated,
  CAST(rk // 16 AS BIGINT) AS batch_id,
  CAST(rk % 16 AS BIGINT) AS pos_in_batch,
  round((bucket_cap - least(n_tokens, bucket_cap)) / bucket_cap, 6) AS pad_frac
FROM r"""

    o["conv_turn_latency"] = f"""
WITH t AS (SELECT * FROM read_parquet('{T2_TRANSCRIPTS}')),
lagd AS (
  SELECT conv_id, turn_idx, tool, role,
    lag(role) OVER w AS prev_role,
    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)
)
SELECT conv_id, turn_idx, tool, CAST(delta_us AS BIGINT) AS delta_us
FROM lagd WHERE role = 'assistant' AND prev_role = 'user'"""

    o["conv_context_budget"] = f"""
WITH t AS (SELECT * FROM read_parquet('{T2_TRANSCRIPTS}'))
SELECT conv_id, turn_idx,
  CAST(sum(CAST(len({SQL_TOKS}) AS BIGINT))
       OVER (PARTITION BY conv_id ORDER BY turn_idx, ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
  sum(CAST(len({SQL_TOKS}) AS BIGINT))
       OVER (PARTITION BY conv_id ORDER BY turn_idx, ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 2000 AS over_budget
FROM t"""

    o["conv_tool_retry_chains"] = f"""
WITH t AS (
  SELECT conv_id, tool, turn_idx, regexp_extract(text, 'status=(\\w+)', 1) AS status
  FROM read_parquet('{T2_TRANSCRIPTS}')
  WHERE tool <> 'none' AND regexp_extract(text, 'status=(\\w+)', 1) <> ''
),
w AS (
  SELECT *,
    CASE WHEN lag(status) OVER win IS NULL OR status <> lag(status) OVER win
         THEN 1 ELSE 0 END AS chg,
    lead(status) OVER win AS next_status
  FROM t WINDOW win AS (PARTITION BY conv_id, tool ORDER BY turn_idx)
),
i AS (
  SELECT *, sum(chg) OVER (PARTITION BY conv_id, tool ORDER BY turn_idx) AS island
  FROM w
)
SELECT conv_id, tool,
  min(turn_idx) AS chain_start,
  max(turn_idx) AS chain_end,
  count(*) AS n_failures,
  coalesce(arg_max(next_status, turn_idx) = 'ok', false) AS recovered
FROM i WHERE status = 'err'
GROUP BY conv_id, tool, island"""

    o["conv_role_sequence_qa"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role,
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{T2_TRANSCRIPTS}')
),
f AS (
  SELECT conv_id, role,
    (role = 'assistant' AND prev = 'assistant') AS f_da,
    (role = 'tool' AND (prev IS NULL OR prev NOT IN ('assistant', 'tool'))) AS f_ot,
    (turn_idx = 0 AND role NOT IN ('system', 'user')) AS f_bo
  FROM t
),
a AS (
  SELECT conv_id,
    count(*) AS n_turns,
    CAST(sum(CASE WHEN f_da THEN 1 ELSE 0 END) AS BIGINT) AS double_assistant,
    CAST(sum(CASE WHEN f_ot THEN 1 ELSE 0 END) AS BIGINT) AS orphan_tool,
    CAST(sum(CASE WHEN f_bo THEN 1 ELSE 0 END) AS BIGINT) AS bad_open,
    bool_or(role = 'assistant') AS has_assistant
  FROM f GROUP BY conv_id
)
SELECT conv_id, n_turns, double_assistant, orphan_tool, bad_open, has_assistant,
  (double_assistant = 0 AND orphan_tool = 0 AND bad_open = 0 AND has_assistant)
    AS qa_pass
FROM a"""

    o["conv_exact_dedup"] = f"""
WITH s AS (
  SELECT conv_id, turn_idx,
    md5(coalesce(role, '') || '|' || coalesce(text, '')) AS h
  FROM read_parquet('{T2_TRANSCRIPTS}')
),
g AS (
  SELECT conv_id, md5(string_agg(h, '' ORDER BY turn_idx)) AS digest
  FROM s GROUP BY conv_id
)
SELECT conv_id, digest,
  count(*) OVER (PARTITION BY digest) AS group_size,
  min(conv_id) OVER (PARTITION BY digest) AS keeper,
  conv_id <> min(conv_id) OVER (PARTITION BY digest) AS is_dup
FROM g"""

    o["conv_self_repetition"] = f"""
WITH g AS (
  SELECT conv_id, text, count(*) AS n_repeats,
    min(turn_idx) AS first_idx, max(turn_idx) AS last_idx
  FROM read_parquet('{T2_TRANSCRIPTS}')
  GROUP BY conv_id, text HAVING count(*) > 1
)
SELECT conv_id, md5(text) AS text_digest, n_repeats, first_idx, last_idx,
  last_idx - first_idx AS span
FROM g"""

    o["conv_turn_boilerplate"] = f"""
SELECT md5(text) AS text_digest,
  count(*) AS n_occurrences,
  count(DISTINCT conv_id) AS n_convs
FROM read_parquet('{T2_TRANSCRIPTS}')
GROUP BY md5(text)
HAVING count(*) >= 2 AND count(DISTINCT conv_id) > 1"""

    o["conv_curation_gate"] = f"""
WITH rq AS (
  SELECT conv_id, turn_idx, role,
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{T2_TRANSCRIPTS}')
),
qa AS (
  SELECT conv_id,
    count(*) AS n_turns,
    (sum(CASE WHEN role = 'assistant' AND prev = 'assistant' THEN 1 ELSE 0 END) = 0
     AND sum(CASE WHEN role = 'tool' AND (prev IS NULL OR prev NOT IN ('assistant','tool')) THEN 1 ELSE 0 END) = 0
     AND sum(CASE WHEN turn_idx = 0 AND role NOT IN ('system','user') THEN 1 ELSE 0 END) = 0
     AND bool_or(role = 'assistant')) AS qa_pass
  FROM rq GROUP BY conv_id
),
hs AS (
  SELECT conv_id, turn_idx,
    md5(coalesce(role, '') || '|' || coalesce(text, '')) AS h
  FROM read_parquet('{T2_TRANSCRIPTS}')
),
dg AS (
  SELECT conv_id, md5(string_agg(h, '' ORDER BY turn_idx)) AS digest
  FROM hs GROUP BY conv_id
),
dd AS (
  SELECT conv_id,
    conv_id <> min(conv_id) OVER (PARTITION BY digest) AS is_dup
  FROM dg
),
ts AS (
  SELECT conv_id, tool, turn_idx, regexp_extract(text, 'status=(\\w+)', 1) AS status
  FROM read_parquet('{T2_TRANSCRIPTS}')
  WHERE tool <> 'none' AND regexp_extract(text, 'status=(\\w+)', 1) <> ''
),
tw AS (
  SELECT *,
    CASE WHEN lag(status) OVER win IS NULL OR status <> lag(status) OVER win
         THEN 1 ELSE 0 END AS chg,
    lead(status) OVER win AS next_status
  FROM ts WINDOW win AS (PARTITION BY conv_id, tool ORDER BY turn_idx)
),
ti AS (
  SELECT *, sum(chg) OVER (PARTITION BY conv_id, tool ORDER BY turn_idx) AS island
  FROM tw
),
tc AS (
  SELECT conv_id, count(*) AS n_failures,
    coalesce(arg_max(next_status, turn_idx) = 'ok', false) AS recovered
  FROM ti WHERE status = 'err'
  GROUP BY conv_id, tool, island
),
ch AS (
  SELECT conv_id, max(n_failures) AS max_chain_failures,
    bool_or(NOT recovered) AS has_unrecovered_chain
  FROM tc GROUP BY conv_id
)
SELECT qa.conv_id, qa.n_turns, qa.qa_pass, dd.is_dup,
  coalesce(ch.max_chain_failures, 0) AS max_chain_failures,
  coalesce(ch.has_unrecovered_chain, false) AS has_unrecovered_chain,
  (qa.qa_pass AND NOT dd.is_dup AND coalesce(ch.max_chain_failures, 0) < 3)
    AS eligible
FROM qa
LEFT JOIN dd USING (conv_id)
LEFT JOIN ch USING (conv_id)"""

    o["conv_gate_incremental"] = o["conv_curation_gate"]

    o["conv_pack"] = f"""
WITH toks AS (
  SELECT conv_id,
    CAST(('0x' || substr(md5(conv_id), 1, 4))::BIGINT % 64 AS INT) AS shard,
    CAST(sum(CAST(len({SQL_TOKS}) AS BIGINT)) AS BIGINT) AS n_tokens
  FROM read_parquet('{T2_TRANSCRIPTS}') GROUP BY conv_id
),
seq AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY conv_id) AS rn FROM toks
),
packs AS (
  WITH RECURSIVE r AS (
    SELECT shard, rn, conv_id, n_tokens, CAST(0 AS BIGINT) AS pack_id,
           n_tokens AS fill
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.shard, s.rn, s.conv_id, s.n_tokens,
      CASE WHEN r.fill + s.n_tokens > 2000 THEN r.pack_id + 1 ELSE r.pack_id END,
      CASE WHEN r.fill + s.n_tokens > 2000 THEN s.n_tokens
           ELSE r.fill + s.n_tokens END
    FROM seq s JOIN r ON s.shard = r.shard AND s.rn = r.rn + 1
  ) SELECT * FROM r
)
SELECT shard, conv_id, n_tokens, pack_id,
  row_number() OVER (PARTITION BY shard, pack_id ORDER BY conv_id) - 1 AS pack_pos,
  fill, n_tokens > 2000 AS oversize
FROM packs"""

    o["conv_role_drift"] = f"""
WITH base AS (
  SELECT coalesce(CAST(role AS VARCHAR), '<null>') AS cat,
         ts >= TIMESTAMP '2025-02-01' AS cur
  FROM read_parquet('{T2_TRANSCRIPTS}')
),
counts AS (
  SELECT cat,
    CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM base GROUP BY cat
),
tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref, CAST(sum(n_cur) AS BIGINT) AS t_cur FROM counts)
SELECT 'role' AS feature, cat, n_ref, n_cur,
  round(greatest(n_ref / CAST(t_ref AS DOUBLE), 1e-6), 6) AS p_ref,
  round(greatest(n_cur / CAST(t_cur AS DOUBLE), 1e-6), 6) AS p_cur,
  round((greatest(n_cur / CAST(t_cur AS DOUBLE), 1e-6) - greatest(n_ref / CAST(t_ref AS DOUBLE), 1e-6))
        * (ln(greatest(n_cur / CAST(t_cur AS DOUBLE), 1e-6)) - ln(greatest(n_ref / CAST(t_ref AS DOUBLE), 1e-6))), 6) AS psi_term
FROM counts, tot"""

    o["bm25_search"] = f"""
WITH dterms AS (SELECT doc_id AS doc, unnest({SQL_TOKS}) AS term FROM documents),
tf AS (SELECT doc, term, count(*) AS tf FROM dterms GROUP BY doc, term),
dlen AS (SELECT doc, count(*) AS dl FROM dterms GROUP BY doc),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 avg(CAST(len({SQL_TOKS}) AS DOUBLE)) AS avgdl
          FROM documents),
qs AS (
  SELECT doc_id AS qid,
         list_distinct(list_filter(regexp_split_to_array(trim(
           array_to_string(list_slice({SQL_TOKS}, 1, 8), ' ')), '\\s+'), t -> t <> '')) AS qterms
  FROM documents ORDER BY doc_id LIMIT 5
),
qt AS (SELECT qid, unnest(qterms) AS term FROM qs),
cand AS (
  SELECT qt.qid, tf.doc, tf.term,
    ln(1.0 + ((s.n - dfq.df) + 0.5) / (CAST(dfq.df AS DOUBLE) + 0.5))
      * (CAST(tf.tf AS DOUBLE) * 2.2)
      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dlen.dl AS DOUBLE)) / s.avgdl)) AS s
  FROM qt JOIN dfq USING (term) JOIN tf USING (term) JOIN dlen USING (doc), stats s
),
scored AS (
  SELECT qid, doc, list_sum(list(s ORDER BY term)) AS score
  FROM cand GROUP BY qid, doc
),
ranked AS (
  SELECT qid, doc, score,
    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc) AS rank
  FROM scored
)
SELECT qid AS query_id, doc AS doc_id, round(score, 6) AS score,
  CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10"""

    # Hybrid RRF = the bm25_search CTE chain + the sim_topk_brute chain
    # (queries restricted to vec_id < 5, k=10), each contribution
    # quantized to decimal(19,9) before the order-independent sum.
    _cos_qn_h = sql_cosine("q.embedding", "n.embedding")
    o["hybrid_search_rrf"] = f"""
WITH dterms AS (SELECT doc_id AS doc, unnest({SQL_TOKS}) AS term FROM documents),
tf AS (SELECT doc, term, count(*) AS tf FROM dterms GROUP BY doc, term),
dlen AS (SELECT doc, count(*) AS dl FROM dterms GROUP BY doc),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 avg(CAST(len({SQL_TOKS}) AS DOUBLE)) AS avgdl
          FROM documents),
qs AS (
  SELECT doc_id AS qid,
         list_distinct(list_filter(regexp_split_to_array(trim(
           array_to_string(list_slice({SQL_TOKS}, 1, 8), ' ')), '\\s+'), t -> t <> '')) AS qterms
  FROM documents ORDER BY doc_id LIMIT 5
),
qt AS (SELECT qid, unnest(qterms) AS term FROM qs),
cand AS (
  SELECT qt.qid, tf.doc, tf.term,
    ln(1.0 + ((s.n - dfq.df) + 0.5) / (CAST(dfq.df AS DOUBLE) + 0.5))
      * (CAST(tf.tf AS DOUBLE) * 2.2)
      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dlen.dl AS DOUBLE)) / s.avgdl)) AS s
  FROM qt JOIN dfq USING (term) JOIN tf USING (term) JOIN dlen USING (doc), stats s
),
lexscored AS (
  SELECT qid, doc, list_sum(list(s ORDER BY term)) AS score
  FROM cand GROUP BY qid, doc
),
lexranked AS (
  SELECT qid, doc, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc) AS rank
  FROM lexscored
),
dq AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 5),
densescored AS (
  SELECT q.qid, n.vec_id AS doc, {_cos_qn_h} AS cos
  FROM dq q JOIN embeddings n ON n.vec_id <> q.qid),
denseranked AS (
  SELECT qid, doc,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc ASC) AS rank
  FROM densescored),
contrib AS (
  SELECT qid, doc, CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(19,9)) AS c
  FROM lexranked WHERE rank <= 10
  UNION ALL
  SELECT qid, doc, CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(19,9)) AS c
  FROM denseranked WHERE rank <= 10),
fused AS (SELECT qid, doc, sum(c) AS s FROM contrib GROUP BY qid, doc),
fr AS (
  SELECT qid, doc, s,
         row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc ASC) AS rank
  FROM fused)
SELECT qid AS query_id, doc AS doc_id, CAST(s AS DOUBLE) AS rrf_score,
  CAST(rank AS INT) AS rank
FROM fr WHERE rank <= 10"""

    # json path profile: expected (path, type) counts reconstructed from
    # the synthesis rule — %13 docs are malformed (and contribute ONLY the
    # '$ malformed' row), %3/%7 add conditional keys.
    o["profile_json_paths"] = """
WITH c AS (SELECT
    count(*) FILTER (doc_id % 13 <> 0) AS ok,
    count(*) FILTER (doc_id % 13 = 0) AS bad_n,
    count(*) FILTER (doc_id % 3 = 0 AND doc_id % 13 <> 0) AS opt_n,
    count(*) FILTER (doc_id % 7 = 0 AND doc_id % 13 <> 0) AS note_n
  FROM documents)
SELECT path, jtype, n FROM (
  SELECT '$' AS path, 'object' AS jtype, ok AS n FROM c
  UNION ALL SELECT '$', 'malformed', bad_n FROM c
  UNION ALL SELECT '$.id', 'number', ok FROM c
  UNION ALL SELECT '$.meta', 'object', ok FROM c
  UNION ALL SELECT '$.meta.lang', 'string', ok FROM c
  UNION ALL SELECT '$.meta.source', 'string', ok FROM c
  UNION ALL SELECT '$.tags', 'array', ok FROM c
  UNION ALL SELECT '$.tags[*]', 'string', 2 * ok FROM c
  UNION ALL SELECT '$.score', 'number', ok FROM c
  UNION ALL SELECT '$.opt', 'object', opt_n FROM c
  UNION ALL SELECT '$.opt.deep', 'boolean', opt_n FROM c
  UNION ALL SELECT '$.note', 'null', note_n FROM c
) t WHERE n > 0"""

    # temperature mixture: mirror the driver-side quantization chain —
    # round 6 after pow, after the d-ordered sum, after the share ratio,
    # and after the final rate; then exact integer micro-rate arithmetic.
    o["curation_temperature_mix"] = f"""
WITH c AS (SELECT lang AS d, count(*) AS n FROM documents GROUP BY lang),
w AS (SELECT d, n, round(pow(CAST(n AS DOUBLE), 0.5), 6) AS w FROM c),
sw AS (SELECT round(list_sum(list(w ORDER BY d)), 6) AS sw FROM w),
r AS (SELECT d, n,
        CAST(round(round(round(w / sw, 6)
             * (SELECT sum(n) FROM c) / n, 6) * 1000000) AS BIGINT) AS micros
      FROM w, sw),
docs AS (SELECT doc_id, lang, micros FROM documents JOIN r ON lang = r.d),
nc AS (SELECT doc_id, lang,
         micros // 1000000
         + CASE WHEN {sql_h60("'up:' || CAST(doc_id AS VARCHAR)")} % 1000000
                     < micros % 1000000 THEN 1 ELSE 0 END AS k
       FROM docs)
SELECT doc_id, lang, CAST(unnest(range(0, k)) AS BIGINT) AS copy_idx
FROM nc WHERE k > 0"""

    o["privacy_k_anonymity"] = """
SELECT event_type,
  CAST(extract(hour FROM ts) AS INT) AS hr,
  CAST(floor(value / 10) AS BIGINT) AS value_band,
  count(*) AS class_size,
  count(DISTINCT user_id) AS l_diversity,
  count(*) < 5 AS at_risk
FROM events
GROUP BY event_type, hr, value_band"""

    o["curation_weighted_sample"] = f"""
WITH keyed AS (
  SELECT doc_id,
    -ln(CAST({sql_h60("'ws1:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
        / 1152921504606846976.0)
      / CAST(n_chars AS DOUBLE) AS wkey
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id,
  CAST(row_number() OVER (ORDER BY wkey ASC, doc_id) AS INT) AS sample_rank
FROM keyed
QUALIFY sample_rank <= 200"""

    o["conv_rl_transitions"] = f"""
WITH lagd AS (
  SELECT conv_id, turn_idx, tool,
    regexp_extract(text, 'status=(\\w+)', 1) AS status,
    md5(coalesce(lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx), ''))
      AS state_digest
  FROM read_parquet('{T2_TRANSCRIPTS}')
),
t AS (SELECT * FROM lagd WHERE tool <> 'none' AND status <> '')
SELECT conv_id,
  CAST(row_number() OVER w AS INT) AS step,
  turn_idx,
  tool AS action,
  CASE WHEN status = 'ok' THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS reward,
  lead(turn_idx) OVER w IS NULL AS done,
  state_digest
FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)"""

    o["text_ngram_novelty"] = f"""
WITH tokd AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
shing_list AS (SELECT doc_id, {SQL_SHINGLES} AS shingles FROM tokd),
grams AS (
  SELECT doc_id AS doc,
    {sql_h60('g')} AS gh
  FROM (SELECT doc_id, unnest(shingles) AS g FROM shing_list)
),
gdf AS (SELECT gh, CAST(count(*) AS BIGINT) AS gram_df FROM grams GROUP BY gh)
SELECT doc AS doc_id,
  count(*) AS n_grams,
  CAST(sum(CASE WHEN gram_df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
  round(1.0 - sum(CASE WHEN gram_df > 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
    AS novelty
FROM grams JOIN gdf USING (gh)
GROUP BY doc"""

    o["transcript_contract"] = f"""
WITH t AS (SELECT * FROM read_parquet('{T2_TRANSCRIPTS}')),
s AS (
  SELECT count(*) AS n,
    CAST(sum(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN turn_idx IS NOT NULL AND turn_idx < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
    CAST(sum(CASE WHEN conv_id IS NOT NULL AND NOT regexp_matches(conv_id, '^conv-\\d{{8}}$') THEN 1 ELSE 0 END) AS BIGINT) AS v3,
    CAST(sum(CASE WHEN role IS NOT NULL AND role NOT IN ('system','user','assistant','tool') THEN 1 ELSE 0 END) AS BIGINT) AS v4,
    CAST(count(*) - count(DISTINCT (conv_id, turn_idx)) AS BIGINT) AS v5
  FROM t
)
SELECT 'not_null:conv_id' AS check, n AS n_rows, v0 AS n_violations, v0 <= 0 AS passed FROM s
UNION ALL SELECT 'not_null:ts', n, v1, v1 <= 0 FROM s
UNION ALL SELECT 'range:turn_idx', n, v2, v2 <= 0 FROM s
UNION ALL SELECT 'regex:conv_id', n, v3, v3 <= 0 FROM s
UNION ALL SELECT 'enum:role', n, v4, v4 <= 0 FROM s
UNION ALL SELECT 'unique:conv_id_turn_idx', n, v5, v5 <= 0 FROM s"""

    o["conv_funnel"] = f"""
WITH s1 AS (
  SELECT conv_id, min(epoch_us(ts)) AS step1_us
  FROM read_parquet('{T2_TRANSCRIPTS}') WHERE role = 'user' GROUP BY conv_id
),
s2 AS (
  SELECT e.conv_id, min(epoch_us(e.ts)) AS step2_us
  FROM read_parquet('{T2_TRANSCRIPTS}') e JOIN s1 USING (conv_id)
  WHERE e.role = 'assistant' AND epoch_us(e.ts) > s1.step1_us
  GROUP BY e.conv_id
),
s3 AS (
  SELECT e.conv_id, min(epoch_us(e.ts)) AS step3_us
  FROM read_parquet('{T2_TRANSCRIPTS}') e JOIN s2 USING (conv_id)
  WHERE e.role = 'tool' AND epoch_us(e.ts) > s2.step2_us
  GROUP BY e.conv_id
)
SELECT s1.conv_id, step1_us, step2_us, step3_us,
  CAST(1 + CASE WHEN step2_us IS NULL THEN 0 ELSE 1 END
         + CASE WHEN step3_us IS NULL THEN 0 ELSE 1 END AS INT) AS n_steps,
  step3_us IS NOT NULL AS converted
FROM s1 LEFT JOIN s2 USING (conv_id) LEFT JOIN s3 USING (conv_id)"""

    o["text_hashed_features"] = f"""
WITH toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents)
SELECT doc_id,
  CAST({sql_h60('tok')} % 256 AS INT) AS bucket,
  count(*) AS tf
FROM toks GROUP BY doc_id, bucket"""

    # html_text_extract: the oracle recomputes the EXPECTED extraction from
    # the raw fields (the registry's encode->decode convention): the Spark
    # side only ever sees the synthesized markup; equality proves the
    # extractor inverted the wrapping (tags dropped, entities decoded,
    # whitespace normalized) exactly.
    o["html_text_extract"] = """
SELECT doc_id,
  'Doc ' || doc_id || ' — ' || source || chr(10) ||
  'Home' || chr(10) || 'About' || chr(10) ||
  'Doc ' || doc_id || chr(10) ||
  (CASE WHEN doc_id % 5 = 0 THEN 'note: ' ELSE '' END)
    || trim(regexp_replace(text, '[ \t]+', ' ', 'g'))
    || (CASE WHEN doc_id % 3 = 0 THEN ' ref' ELSE '' END) || chr(10) ||
  'Read more' || chr(10) ||
  '© 2026 Example & Co.' AS html_text,
  'Doc ' || doc_id || ' — ' || source AS html_title,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS INTEGER) AS n_links
FROM documents"""

    # multimodal_jpeg_meta / curation_domain_cap: oracle recomputes the
    # expected decode/extraction from the synthesis parameters (the
    # encode->decode convention) — the Spark side sees only bytes/URLs.
    o["multimodal_jpeg_meta"] = """
SELECT doc_id,
  doc_id % 13 <> 0 AS jp_valid,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(1 + doc_id % 200 AS INTEGER) END AS jp_width,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(1 + doc_id % 120 AS INTEGER) END AS jp_height,
  CASE WHEN doc_id % 13 = 0 THEN NULL
       WHEN doc_id % 2 = 1 THEN CAST(3 AS INTEGER) ELSE CAST(1 AS INTEGER) END AS jp_components,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(8 AS INTEGER) END AS jp_precision,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id % 4 = 0 END AS jp_progressive
FROM documents"""

    o["curation_domain_cap"] = """
WITH d AS (
  SELECT doc_id,
    CASE doc_id % 7
      WHEN 0 THEN 'example.com'
      WHEN 1 THEN 'example.com'
      WHEN 2 THEN 'example.co.uk'
      WHEN 3 THEN 'project.github.io'
      WHEN 4 THEN 'example.com'
      WHEN 5 THEN NULL
      ELSE 'node7.internal-corp'
    END AS rd_domain
  FROM documents
),
r AS (
  SELECT doc_id, rd_domain,
    row_number() OVER (PARTITION BY rd_domain ORDER BY doc_id) AS rn
  FROM d
)
SELECT doc_id, rd_domain, (rd_domain IS NULL OR rn <= 100) AS dc_keep FROM r"""

    # text_canonical_key: both engines implement the same Unicode NFC, so
    # the canonical form (and its h60 key) must match exactly; chr(769) is
    # the combining acute the Spark decoration appends in decomposed form.
    _canon = (
        "trim(regexp_replace(lower(nfc_normalize("
        "(CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END)"
        " || '  Cafe' || chr(769) || ' ' || chr(9) || ' No'"
        " || CAST(doc_id % 3 AS VARCHAR) || '  '"
        ")), '\\s+', ' ', 'g'))"
    )
    o["text_canonical_key"] = f"""
WITH c AS (SELECT doc_id, {_canon} AS canon_text FROM documents)
SELECT doc_id, canon_text, {sql_h60('canon_text')} AS canon_key FROM c"""

    o["curation_robots_gate"] = """
WITH d AS (
  SELECT doc_id,
    CASE doc_id % 7
      WHEN 0 THEN 'example.com' WHEN 1 THEN 'example.com' WHEN 2 THEN 'example.co.uk'
      WHEN 3 THEN 'project.github.io' WHEN 4 THEN 'example.com' WHEN 5 THEN NULL
      ELSE 'node7.internal-corp' END AS rd_domain,
    CASE doc_id % 5
      WHEN 0 THEN '/public/x' WHEN 1 THEN '/private/doc' WHEN 2 THEN '/private/archive/old'
      WHEN 3 THEN '/tmp/cache' ELSE '/' END AS path
  FROM documents
),
rules(domain, prefix, allow) AS (VALUES
  ('example.com', '/private', FALSE),
  ('example.com', '/private/archive', TRUE),
  ('example.co.uk', '/', FALSE),
  ('project.github.io', '/tmp', FALSE)
),
m AS (
  SELECT d.doc_id, r.prefix, r.allow,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
  FROM d JOIN rules r ON d.rd_domain = r.domain AND d.path LIKE r.prefix || '%'
)
SELECT d.doc_id, d.rd_domain, d.path,
  coalesce(m.allow, TRUE) AS rg_allow, m.prefix AS rg_rule
FROM d LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (doc_id)"""

    from ..operators.zorder import zorder_sql

    _zsql = zorder_sql(["(user_id % 2048)", "(event_id % 2048)"], [(0, 2047), (0, 2047)], bits=10)
    o["zorder_key_events"] = f"SELECT event_id, {_zsql} AS z_key FROM events"

    o["heavy_hitters_tokens"] = f"""
WITH toks AS (SELECT unnest({SQL_TOKS}) AS item FROM documents),
g AS (SELECT item, count(*) AS cnt FROM toks GROUP BY item),
t AS (SELECT sum(cnt) AS total FROM g)
SELECT item, cnt, round(CAST(cnt AS DOUBLE) / total, 9) AS freq
FROM g, t WHERE cnt > total * 0.02"""

    o["text_char_entropy"] = """
WITH d AS (SELECT doc_id, substr(text, 1, 2000) AS s FROM documents),
c AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(s)), i -> s[i])) AS ch FROM d),
g AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY doc_id, ch),
e AS (SELECT doc_id, sum(cnt) AS n, sum(cnt * log2(cnt)) AS sl FROM g GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(round(log2(CAST(e.n AS DOUBLE)) - e.sl / e.n, 6), 0.0) AS char_entropy
FROM d LEFT JOIN e USING (doc_id)"""

    _c4_keep = (
        "len(list_filter(regexp_split_to_array(x, '\\s+'), w -> w <> '')) >= 3"
        " AND regexp_matches(x, '[.!?\"]$')"
        " AND NOT contains(lower(x), 'javascript')"
        " AND NOT contains(lower(x), 'privacy policy')"
        " AND NOT contains(lower(x), 'terms of use')"
        " AND NOT contains(lower(x), 'cookie policy')"
        " AND NOT contains(lower(x), 'uses cookies')"
    )
    o["curation_c4_lines"] = f"""
WITH d AS (SELECT doc_id, text FROM documents),
nb AS (
  SELECT doc_id,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines
  FROM d
),
k AS (SELECT doc_id, lines, list_filter(lines, x -> {_c4_keep}) AS kept FROM nb)
SELECT doc_id,
  coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
  CAST(len(kept) AS INT) AS n_lines_kept,
  CAST(len(lines) - len(kept) AS INT) AS n_lines_dropped,
  len(kept) >= 3
    AND NOT contains(coalesce(lower(array_to_string(kept, chr(10))), ''), 'lorem ipsum')
    AND NOT contains(coalesce(array_to_string(kept, chr(10)), ''), '{{') AS c4_pass
FROM k"""

    _sql_toks_of = "list_filter(regexp_split_to_array(trim({c}), '\\s+'), x -> x <> '')"
    o["preference_pairs"] = f"""
WITH t AS (SELECT * FROM read_parquet('{T2_TRANSCRIPTS}')),
lagd AS (
  SELECT role, text,
    lag(role) OVER w AS prev_role, lag(text) OVER w AS prev_text
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)
),
pairs AS (
  SELECT
    coalesce(array_to_string(list_slice({_sql_toks_of.format(c='prev_text')}, 1, 4), ' '), '') AS prompt_key,
    text AS completion,
    CAST(len({_sql_toks_of.format(c='text')}) AS DOUBLE) AS score
  FROM lagd WHERE role = 'assistant' AND prev_role = 'user'
),
ranked AS (
  SELECT prompt_key, completion, score,
    row_number() OVER (PARTITION BY prompt_key ORDER BY score DESC, completion DESC) AS rh,
    row_number() OVER (PARTITION BY prompt_key ORDER BY score ASC, completion ASC) AS rl
  FROM pairs
),
counts AS (
  SELECT prompt_key, CAST(count(DISTINCT completion) AS BIGINT) AS n_candidates
  FROM pairs GROUP BY 1
)
SELECT h.prompt_key, h.completion AS chosen, l.completion AS rejected,
  h.score AS score_chosen, l.score AS score_rejected,
  h.score - l.score AS margin, c.n_candidates
FROM (SELECT * FROM ranked WHERE rh = 1) h
JOIN (SELECT * FROM ranked WHERE rl = 1) l USING (prompt_key)
JOIN counts c USING (prompt_key)
WHERE h.completion <> l.completion AND h.score > l.score"""

    o["sft_masked_sequence"] = (
        _sft_cte
        + """
, ofs AS (
  SELECT conv_id, role, r, CAST(length(r) AS BIGINT) AS len,
    row_number() OVER w AS rn,
    coalesce(sum(CAST(length(r) AS BIGINT)) OVER
      (PARTITION BY conv_id ORDER BY turn_idx, ts
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM t
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)
)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(len) AS BIGINT) AS n_chars,
  md5(string_agg(r, '' ORDER BY rn)) AS seq_md5,
  string_agg(CASE WHEN role = 'assistant'
                  THEN CAST(s AS VARCHAR) || '-' || CAST(s + len AS VARCHAR) END,
             ';' ORDER BY rn) AS mask_csv,
  CAST(coalesce(sum(len) FILTER (WHERE role = 'assistant'), 0) AS BIGINT) AS trainable_chars,
  round(coalesce(sum(len) FILTER (WHERE role = 'assistant'), 0) / sum(len), 6) AS trainable_frac
FROM ofs GROUP BY conv_id"""
    )

    # shared synthesis CTEs for the curation family
    _lined = """
WITH base AS (SELECT doc_id, source,
  substring(text, 1, 60) AS head, substring(text, 30, 40) AS mid FROM documents),
l AS (SELECT doc_id, source,
  head || chr(10) || mid || chr(10)
       || (CASE WHEN doc_id % 3 = 0 THEN head ELSE mid || ' tail' END)
       || chr(10) || 'footer line' AS text
FROM base),
s AS (SELECT doc_id, text,
  list_filter(str_split(text, chr(10)), x -> trim(x) <> '') AS lines,
  (list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))[1:500] AS tk
FROM l),
g AS (SELECT doc_id, text, lines, tk,
  list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i + 1]) AS bg
FROM s),
stats AS (SELECT doc_id,
  round(CASE WHEN len(lines) > 1
        THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
        ELSE 0.0 END, 6) AS dup_line_frac,
  round(CASE WHEN len(bg) > 0
        THEN CAST(list_max(list_transform(list_distinct(bg),
               b -> len(list_filter(bg, x -> x = b)))) AS DOUBLE) / len(bg)
        ELSE 0.0 END, 6) AS top_bigram_frac,
  round(CAST(len(regexp_extract_all(array_to_string(tk, ' '), '[#|~\\\\]|\\.\\.\\.')) AS DOUBLE)
        / greatest(len(tk), 1), 6) AS symbol_word_ratio,
  round(CASE WHEN len(tk) > 0
        THEN CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(tk)
        ELSE 0.0 END, 6) AS alpha_word_frac
FROM g)
"""
    o["curation_repetition"] = (
        _lined
        + "SELECT doc_id, dup_line_frac, top_bigram_frac, symbol_word_ratio, alpha_word_frac FROM stats"
    )
    o["curation_gopher"] = (
        _lined
        + """
SELECT doc_id,
  (dup_line_frac <= 0.30 AND top_bigram_frac <= 0.20
   AND symbol_word_ratio <= 0.10 AND alpha_word_frac >= 0.80) AS gopher_pass
FROM stats"""
    )

    o["curation_url_filter"] = """
WITH d AS (SELECT doc_id,
  CASE WHEN doc_id % 5 = 0 THEN 'ads.example.com'
       WHEN doc_id % 5 = 1 THEN 'example.com'
       WHEN doc_id % 5 = 2 THEN 'news.good.org'
       WHEN doc_id % 5 = 3 THEN 'bad.net.evil.io'
       ELSE 'fine.io' END AS dom,
  doc_id % 11 = 0 AS casino
FROM documents),
x AS (SELECT doc_id, dom, casino,
  'https://' || dom || '/d/' || CAST(doc_id AS VARCHAR)
    || CASE WHEN casino THEN '/casino/x' ELSE '' END AS url,
  CASE WHEN dom IN ('ads.example.com', 'example.com') THEN 'example.com' END AS blk
FROM d)
SELECT doc_id, url, dom AS uf_domain, blk AS uf_blocked_domain,
  casino AS uf_blocked_pattern,
  (blk IS NULL AND NOT casino) AS uf_keep
FROM x"""

    o["curation_train_split"] = """
SELECT doc_id,
  CASE WHEN g < 900000 THEN 'train'
       WHEN g < 950000 THEN 'val'
       WHEN g < 1000000 THEN 'test' END AS split
FROM (SELECT doc_id,
        CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          % 1000000 AS g
      FROM documents)"""

    o["curation_lm_quality"] = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> [CAST('0x' || substr(md5(toks[i]), 1, 15) AS BIGINT) % 32,
                      CAST('0x' || substr(md5(toks[i+1]), 1, 15) AS BIGINT) % 32])) AS bg
  FROM d),
b AS (SELECT doc_id, bg[1] AS hb, bg[2] AS cb FROM g),
cnts AS (SELECT hb, cb, count(*) AS n FROM b GROUP BY hb, cb),
tots AS (SELECT hb, sum(n) AS tot FROM cnts GROUP BY hb),
lp AS (SELECT hb, cb, CAST(round(ln((n + 1.0) / (tot + 32.0)), 9) AS DECIMAL(18,9)) AS lp
       FROM cnts JOIN tots USING (hb)),
s AS (SELECT doc_id, CAST(sum(lp) AS DOUBLE) / count(*) AS lm_logprob
      FROM b JOIN lp USING (hb, cb) GROUP BY doc_id)
SELECT doc_id, lm_logprob FROM documents LEFT JOIN s USING (doc_id)"""

    # CCNet head/middle/tail: the lm_quality score CTEs verbatim, then
    # ntile(3) per language ordered by (score DESC NULLS LAST, doc_id) —
    # same deterministic total order as the Spark window.
    o["curation_ccnet_buckets"] = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> [CAST('0x' || substr(md5(toks[i]), 1, 15) AS BIGINT) % 32,
                      CAST('0x' || substr(md5(toks[i+1]), 1, 15) AS BIGINT) % 32])) AS bg
  FROM d),
b AS (SELECT doc_id, bg[1] AS hb, bg[2] AS cb FROM g),
cnts AS (SELECT hb, cb, count(*) AS n FROM b GROUP BY hb, cb),
tots AS (SELECT hb, sum(n) AS tot FROM cnts GROUP BY hb),
lp AS (SELECT hb, cb, CAST(round(ln((n + 1.0) / (tot + 32.0)), 9) AS DECIMAL(18,9)) AS lp
       FROM cnts JOIN tots USING (hb)),
s AS (SELECT doc_id, CAST(sum(lp) AS DOUBLE) / count(*) AS lm_logprob
      FROM b JOIN lp USING (hb, cb) GROUP BY doc_id),
sc AS (SELECT doc_id, lang, lm_logprob FROM documents LEFT JOIN s USING (doc_id))
SELECT doc_id, lang, lm_logprob,
       CASE WHEN lm_logprob IS NULL THEN 'tail'
            ELSE CASE ntile(3) OVER (PARTITION BY lang
                                     ORDER BY lm_logprob DESC NULLS LAST, doc_id)
                 WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
       END AS ppl_bucket
FROM sc"""

    # Hashed Naive-Bayes: per-bucket log-odds with add-one smoothing,
    # trained and applied on the same corpus (so every bucket a document
    # looks up exists in the count table). Each ln() is rounded to 9
    # places and cast to decimal BEFORE the subtraction — the exact
    # quantization the Spark side does driver-side with Decimal.quantize.
    o["curation_nb_classifier"] = f"""
WITH toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents),
lab AS (SELECT doc_id, lang, coalesce(lang = 'en', FALSE) AS y FROM documents),
b AS (SELECT doc_id, CAST({sql_h60('tok')} % 256 AS INT) AS bucket FROM toks),
cnt AS (SELECT bucket,
          sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
          sum(CASE WHEN y THEN 0 ELSE 1 END) AS cn
        FROM b JOIN lab USING (doc_id) GROUP BY bucket),
tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
docs_tot AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
                    sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn FROM lab),
w AS (SELECT bucket,
        CAST(round(ln((cp + 1.0) / (tp + 256.0)), 9) AS DECIMAL(19,9))
        - CAST(round(ln((cn + 1.0) / (tn + 256.0)), 9) AS DECIMAL(19,9)) AS w
      FROM cnt, tot),
pr AS (SELECT CAST(round(ln((np + 1.0) / (nn + 1.0)), 9) AS DECIMAL(19,9)) AS prior
       FROM docs_tot),
s AS (SELECT doc_id, sum(w) AS sw FROM b JOIN w USING (bucket) GROUP BY doc_id)
SELECT lab.doc_id, lab.lang,
  CAST(prior + coalesce(sw, CAST(0 AS DECIMAL(19,9))) AS DOUBLE) AS nb_score,
  CAST(prior + coalesce(sw, CAST(0 AS DECIMAL(19,9))) AS DOUBLE) > 0 AS nb_pred
FROM lab LEFT JOIN s USING (doc_id) CROSS JOIN pr"""

    # word2phrase collocations: bigrams via the chr(31)-join trick the BPE
    # oracle established; score arithmetic mirrors Spark's operator order
    # ((c_ab-δ as double) * N) / (c_a * c_b) so doubles are bit-equal.
    o["text_phrase_pmi"] = f"""
WITH t AS (SELECT {SQL_TOKS} AS toks FROM documents),
uni AS (SELECT tok, count(*) AS c_tok FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
bi AS (
  SELECT string_split(pair, chr(31))[1] AS a, string_split(pair, chr(31))[2] AS b,
         count(*) AS c_ab
  FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || chr(31) || toks[i+1])) AS pair FROM t)
  GROUP BY 1, 2 HAVING count(*) >= 5),
n AS (SELECT sum(c_tok) AS n_uni FROM uni),
sc AS (
  SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
         CAST(ua.c_tok AS BIGINT) AS c_a, CAST(ub.c_tok AS BIGINT) AS c_b,
         round(CAST(c_ab - 5 AS DOUBLE) * n.n_uni / (ua.c_tok * ub.c_tok), 6) AS score
  FROM bi JOIN uni ua ON ua.tok = a JOIN uni ub ON ub.tok = b, n)
SELECT a, b, c_ab, c_a, c_b, score FROM sc
ORDER BY score DESC, a, b LIMIT 50"""

    o["text_chi2_keywords"] = f"""
WITH d AS (SELECT lang AS cls, {SQL_TOKS} AS toks FROM documents),
pres AS (SELECT cls, unnest(list_distinct(toks)) AS term FROM d),
tc AS (SELECT cls, term, count(*) AS a FROM pres GROUP BY 1, 2),
tt AS (SELECT term, count(*) AS c_t FROM pres GROUP BY 1),
ct AS (SELECT cls, count(*) AS n_c FROM d GROUP BY 1),
nn AS (SELECT count(*) AS n FROM d),
j AS (SELECT cls, term, a, c_t, n_c, nn.n,
        CAST(a AS DOUBLE) AS ad_, CAST(c_t - a AS DOUBLE) AS bd_,
        CAST(n_c - a AS DOUBLE) AS cd_, CAST(nn.n - c_t - n_c + a AS DOUBLE) AS dd_
      FROM tc JOIN tt USING (term) JOIN ct USING (cls), nn
      WHERE c_t >= 3),
sc AS (
  SELECT cls, term, CAST(a AS BIGINT) AS df_in_class, CAST(c_t AS BIGINT) AS df_total,
    round(n * (ad_ * dd_ - bd_ * cd_) * (ad_ * dd_ - bd_ * cd_)
          / ((ad_ + bd_) * (cd_ + dd_) * (ad_ + cd_) * (bd_ + dd_)), 6) AS chi2
  FROM j WHERE ad_ * (n * 1.0) > c_t * n_c),
r AS (SELECT *, row_number() OVER (PARTITION BY cls ORDER BY chi2 DESC, term) AS rn FROM sc)
SELECT cls, term, df_in_class, df_total, chi2 FROM r WHERE rn <= 10"""

    o["corpus_vocab_growth"] = f"""
WITH nd AS (SELECT count(*) AS n_docs FROM documents),
r AS (SELECT row_number() OVER (ORDER BY doc_id) AS rr, {SQL_TOKS} AS toks FROM documents),
s AS (SELECT CAST(ceil(rr * 10 / CAST(n_docs AS DOUBLE)) AS INT) AS cp, toks FROM r, nd),
tf AS (SELECT tok, min(cp) AS fcp
       FROM (SELECT cp, unnest(toks) AS tok FROM s) GROUP BY 1),
nv AS (SELECT fcp, count(*) AS nvocab FROM tf GROUP BY 1),
pc AS (SELECT cp, count(*) AS docs, sum(len(toks)) AS toks FROM s GROUP BY 1),
j AS (SELECT cp AS checkpoint, docs, toks, coalesce(nvocab, 0) AS nv
      FROM pc LEFT JOIN nv ON pc.cp = nv.fcp)
SELECT checkpoint,
  CAST(sum(docs) OVER w AS BIGINT) AS n_docs,
  CAST(sum(toks) OVER w AS BIGINT) AS n_tokens,
  CAST(sum(nv) OVER w AS BIGINT) AS vocab
FROM j
WINDOW w AS (ORDER BY checkpoint ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

    # NB-classifier evals reuse the classifier oracle verbatim as a CTE
    # (nested WITH is legal in a parenthesized subquery) — one definition
    # of the model, two derived artifacts.
    _nb_scored = o["curation_nb_classifier"]
    o["nb_lift_deciles"] = f"""
WITH scored AS ({_nb_scored}),
lab AS (SELECT doc_id, nb_score, CAST(lang = 'en' AS INT) AS y FROM scored),
d AS (SELECT CAST(ntile(10) OVER (ORDER BY nb_score DESC, doc_id) AS INT) AS decile, y FROM lab),
per AS (SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos FROM d GROUP BY 1)
SELECT decile, n, n_pos,
  round(n_pos / CAST(n AS DOUBLE), 6) AS pos_rate,
  round(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        / CAST((SELECT sum(n_pos) FROM per) AS DOUBLE), 6) AS cum_gain
FROM per"""

    o["nb_auc"] = f"""
WITH scored AS ({_nb_scored}),
r AS (SELECT CAST(lang = 'en' AS INT) AS y,
        rank() OVER (ORDER BY nb_score) + (count(*) OVER (PARTITION BY nb_score) - 1) / 2.0 AS rr
      FROM scored),
a AS (SELECT sum(CASE WHEN y = 1 THEN rr END) AS rank_pos,
        CAST(sum(y) AS BIGINT) AS p,
        CAST(sum(1 - y) AS BIGINT) AS n
      FROM r)
SELECT p, n, round(CASE WHEN p > 0 AND n > 0 THEN (rank_pos - p * (p + 1) / 2.0) / (p * CAST(n AS DOUBLE)) END, 6) AS auc FROM a"""

    # BPE: k=3 merge rounds unrolled; chr(31) is the symbol delimiter.
    # Symbols are joined with DOUBLE delimiters (single at the ends), so
    # one replace() per merge IS the greedy left-to-right sweep (adjacent
    # pair matches share no characters — operators/bpe.py docstring).
    _d = "chr(31)"
    bpe_rounds = []
    for r in range(3):
        bpe_rounds.append(
            f"""p{r} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(toks)), i -> toks[i] || {_d} || toks[i+1])) AS pair
    FROM (SELECT freq, list_filter(string_split(syms, {_d}), x -> x <> '') AS toks FROM w{r})
  ) GROUP BY pair),
m{r} AS (SELECT string_split(pair, {_d})[1] AS a, string_split(pair, {_d})[2] AS b, cnt
         FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
w{r + 1} AS (
  SELECT word, freq,
         replace(syms, {_d}||a||{_d}||{_d}||b||{_d}, {_d}||a||b||{_d}) AS syms
  FROM w{r} CROSS JOIN m{r})"""
        )
    _bpe_w0 = f"""
WITH w0 AS (
  SELECT word, count(*) AS freq,
         {_d} || regexp_replace(word, '(.)', '\\1' || {_d} || {_d}, 'g') AS syms
  FROM (SELECT replace(unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                  x -> x <> '')), {_d}, '') AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY word),
"""
    # re-derive the merges, then re-encode every doc through the final word
    # dictionary (w3.syms IS each word's encoding after all 3 merges)
    o["bpe_encode_docs"] = (
        _bpe_w0
        + ",\n".join(bpe_rounds)
        + f""",
enc AS (SELECT word, list_filter(string_split(syms, {_d}), x -> x <> '') AS subs FROM w3),
dt AS (SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                    x -> replace(x, {_d}, '')), x -> x <> '') AS toks
       FROM documents),
dw AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS word FROM dt),
j AS (SELECT dw.doc_id, dw.pos, enc.subs FROM dw JOIN enc USING (word)),
t AS (SELECT doc_id, pos, generate_subscripts(subs, 1) AS sp, unnest(subs) AS tok FROM j),
agg AS (SELECT doc_id, string_agg(tok, chr(31) ORDER BY pos, sp) AS tokens_sep
        FROM t GROUP BY doc_id)
SELECT d.doc_id, agg.tokens_sep FROM documents d LEFT JOIN agg USING (doc_id)"""
    )

    o["bpe_train_merges"] = (
        f"""
WITH w0 AS (
  SELECT word, count(*) AS freq,
         {_d} || regexp_replace(word, '(.)', '\\1' || {_d} || {_d}, 'g') AS syms
  FROM (SELECT replace(unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                  x -> x <> '')), {_d}, '') AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY word),
"""
        + ",\n".join(bpe_rounds)
        + """
SELECT CAST(0 AS INT) AS merge_rank, a AS lhs, b AS rhs, a||b AS merged, cnt AS pair_count FROM m0
UNION ALL
SELECT CAST(1 AS INT), a, b, a||b, cnt FROM m1
UNION ALL
SELECT CAST(2 AS INT), a, b, a||b, cnt FROM m2"""
    )

    o["curation_dsir_weights"] = r"""
WITH d AS (
  SELECT doc_id, (source = 'src0') AS t,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, t,
         unnest(toks || list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM d),
bk AS (SELECT doc_id, t, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 64 AS b FROM g),
dist AS (SELECT b, count(*) AS q, sum(CASE WHEN t THEN 1 ELSE 0 END) AS p FROM bk GROUP BY b),
tot AS (SELECT sum(q) AS tq, sum(p) AS tp FROM dist),
lr AS (SELECT b, CAST(round(ln((p + 1.0) / (tp + 64.0)) - ln((q + 1.0) / (tq + 64.0)), 9)
                 AS DECIMAL(18,9)) AS lr
       FROM dist, tot),
w AS (SELECT doc_id, CAST(sum(lr) AS DOUBLE) AS dsir_logweight
      FROM bk JOIN lr USING (b) GROUP BY doc_id)
SELECT doc_id, source, dsir_logweight
FROM documents LEFT JOIN w USING (doc_id)"""

    _pii_pats = {
        "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+",
        "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
        "ipv4": r"\b\d{1,3}(?:\.\d{1,3}){3}\b",
        "phone": r"\b\d{3}[- .]\d{3}[- .]\d{4}\b",
    }
    _scrub = "txt"
    for _cat, _tok_ in (("email", "<EMAIL>"), ("ssn", "<ID>"), ("ipv4", "<IP>"), ("phone", "<PHONE>")):
        _scrub = f"regexp_replace({_scrub}, '{_pii_pats[_cat]}', '{_tok_}', 'g')"
    _pii_counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(txt, '{pat}')) AS INT) AS pii_{cat}_count"
        for cat, pat in _pii_pats.items()
    )
    o["curation_pii_scrub"] = f"""
WITH inj AS (SELECT doc_id,
  substring(text, 1, 40) || ' user' || CAST(doc_id AS VARCHAR) || '@example.com '
    || '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
    || (CASE WHEN doc_id % 2 = 0
        THEN ' 555-01' || CAST(doc_id % 10 AS VARCHAR) || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
        THEN ' 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE '' END) AS txt
FROM documents)
SELECT doc_id,
  {_pii_counts},
  {_scrub} AS text_scrubbed
FROM inj"""

    o["curation_pack"] = r"""
WITH d AS (SELECT doc_id, source,
  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
FROM documents),
w AS (SELECT doc_id, source, n_tokens,
  coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
    ROWS UNBOUNDED PRECEDING) - n_tokens, 0) AS before
FROM d)
SELECT doc_id, source, n_tokens,
  CAST(floor(CAST(before AS DOUBLE) / 512) AS BIGINT) AS pack_id,
  CAST(before % 512 AS BIGINT) AS pack_offset
FROM w"""

    o["curation_line_dedup"] = (
        _lined.split("s AS (SELECT")[0]  # reuse base+l CTEs of the lined view
        + """sp AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM l),
e AS (SELECT doc_id, i - 1 AS pos, ls[i] AS ln
      FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM sp)),
m AS (SELECT doc_id, pos, ln,
        len(list_filter(regexp_split_to_array(trim(ln), '\\s+'), x -> x <> '')) >= 3 AS eligible
      FROM e),
wn AS (SELECT *,
        CASE WHEN eligible THEN count(*) OVER part ELSE 1 END AS dfc,
        row_number() OVER (part ORDER BY doc_id, pos) AS rn
       FROM m
       WINDOW part AS (PARTITION BY eligible,
         CASE WHEN eligible THEN ln
              ELSE CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR) END)),
kept AS (SELECT * FROM wn WHERE NOT eligible OR dfc < 2 OR rn = 1),
asm AS (SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text_deduped, count(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, len(ls) AS n_total FROM sp)
SELECT tot.doc_id,
  coalesce(asm.text_deduped, '') AS text_deduped,
  CAST(tot.n_total - coalesce(asm.n_kept, 0) AS INT) AS n_lines_removed
FROM tot LEFT JOIN asm ON tot.doc_id = asm.doc_id"""
    )

    o["curation_mixture"] = """
SELECT doc_id, source FROM documents
WHERE CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000
  < CAST((CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
          WHEN 'src2' THEN 0.25 ELSE 0.1 END) * 1000000 AS BIGINT)"""

    o["text_tfidf_topk"] = (
        _DOC_TOKS_CTE
        + """,
terms AS (SELECT doc_id, unnest(toks) AS term FROM tokd),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
  round(tf.tf * (ln(CAST(1.0 + n.n_docs AS DOUBLE) / CAST(1.0 + dfq.df AS DOUBLE)) + 1.0), 6) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN n),
rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
       FROM scored)
SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank FROM rk WHERE rank <= 3"""
    )

    o["corpus_summary"] = f"""
WITH t AS (SELECT source, text,
  len({SQL_TOKS}) AS n_tok, {sql_h60('text')} AS th FROM documents)
SELECT source,
  count(*) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
  round(avg(length(text)), 6) AS avg_chars,
  count(DISTINCT th) AS n_distinct_texts,
  round(1.0 - count(DISTINCT th) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
FROM t GROUP BY source"""

    o["curation_decontaminate"] = (
        _SHINGLE_CTE
        + f""",
ev AS (SELECT DISTINCT {sql_h60('shingle')} AS egh FROM shing WHERE doc % 37 = 0),
tr AS (SELECT doc, {sql_h60('shingle')} AS gh FROM shing WHERE doc % 37 <> 0),
agg AS (SELECT doc, count(*) AS n_grams, count(ev.egh) AS n_overlap
        FROM tr LEFT JOIN ev ON ev.egh = tr.gh GROUP BY doc)
SELECT dd.doc_id,
  coalesce(agg.n_grams, 0) AS n_grams,
  coalesce(agg.n_overlap, 0) AS n_overlap,
  CASE WHEN coalesce(agg.n_grams, 0) > 0
       THEN round(coalesce(agg.n_overlap, 0) / CAST(agg.n_grams AS DOUBLE), 6)
       ELSE 0.0 END AS overlap_frac,
  coalesce(agg.n_overlap, 0) >= 1 AS contaminated
FROM documents dd LEFT JOIN agg ON agg.doc = dd.doc_id
WHERE dd.doc_id % 37 <> 0"""
    )

    o["curation_decontaminate_fuzzy"] = (
        _SHINGLE_CTE
        + ",\n"
        + _minhash_sig_sql()
        + ",\n"
        + _lsh_bucket_sql()
        + """,
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.doc % 37 <> 0 AND b.doc % 37 = 0),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN shing a ON a.doc = c.doc_a
  JOIN shing b ON b.doc = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
ver AS (
  SELECT doc_a, doc_b,
         round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc = doc_a
  JOIN sizes sb ON sb.doc = doc_b
  WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.4),
per AS (
  SELECT doc_a, count(*) AS n_matches, max(jaccard) AS max_jaccard,
         min(doc_b) AS matched_eval
  FROM ver GROUP BY 1)
SELECT dd.doc_id,
  CAST(coalesce(p.n_matches, 0) AS BIGINT) AS n_matches,
  coalesce(p.max_jaccard, 0.0) AS max_jaccard,
  p.matched_eval,
  coalesce(p.n_matches, 0) > 0 AS contaminated
FROM documents dd LEFT JOIN per p ON p.doc_a = dd.doc_id
WHERE dd.doc_id % 37 <> 0"""
    )

    o["curation_train_shuffle"] = f"""
WITH k AS (SELECT doc_id,
  {sql_h60("'r3:' || CAST(doc_id AS VARCHAR)")} AS skey FROM documents)
SELECT doc_id, CAST(skey % 16 AS INT) AS shard_id,
  CAST(row_number() OVER (PARTITION BY skey % 16 ORDER BY skey, doc_id) AS INT) AS shard_pos
FROM k"""

    cos_bal = sql_cosine("v.embedding", "c.centroid")
    o["cluster_balanced_sample"] = f"""
WITH cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell, {cos_bal} AS cc,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_bal} DESC, c.cell ASC) AS r
    FROM embeddings v CROSS JOIN cents c) t WHERE r = 1),
ranked AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY cell
            ORDER BY {sql_h60("'bal:' || CAST(vec_id AS VARCHAR)")}, vec_id) AS bal_rank
  FROM assign)
SELECT vec_id, CAST(cell AS INT) AS cell, CAST(bal_rank AS INT) AS bal_rank
FROM ranked WHERE bal_rank <= 40"""

    lang_scores = ",\n  ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}" for lang, pat in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    lang_best = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    lang_case = (
        "CASE WHEN " + lang_best + " = 0 THEN 'und' "
        + " ".join(f"WHEN s_{la} = {lang_best} THEN '{la}'" for la in langs)
        + " END"
    )
    o["curation_e2e"] = (
        _DOC_TOKS_CTE
        + f""",
m AS (SELECT doc_id, text, toks,
  len(toks) AS n_tok,
  greatest(length(text), 1) AS n_char,
  len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop,
  len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
  {lang_scores}
FROM tokd),
scored AS (SELECT doc_id, text, toks, n_tok,
  round(0.4 * least(n_tok / 20.0, 1.0)
      + 0.3 * least((n_stop / greatest(n_tok, 1)) * 4, 1.0)
      + 0.15 * (1.0 - least((n_punct / n_char) * 5, 1.0))
      + 0.15 * (1.0 - least((n_digit / n_char) * 5, 1.0)), 6) AS quality,
  {lang_case} AS lang_pred
FROM m),
gated AS (SELECT *, {sql_h60("lower(array_to_string(toks, ' '))")} AS text_key
          FROM scored WHERE quality >= 0.5 AND lang_pred <> 'und'),
keep AS (SELECT text_key, min(doc_id) AS keep_id FROM gated GROUP BY 1)
SELECT g.doc_id, g.lang_pred, g.quality, g.n_tok AS n_ws_tokens, g.text_key AS fp_exact
FROM gated g JOIN keep k ON g.doc_id = k.keep_id"""
    )

    o["text_token_stats"] = (
        _DOC_TOKS_CTE
        + f"""
SELECT doc_id,
  length(text) AS n_chars_c,
  len(toks) AS n_ws_tokens,
  len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
  round(CASE WHEN len(toks) > 0
        THEN length(regexp_replace(text, '\\s', '', 'g')) / len(toks)
        ELSE 0.0 END, 6) AS avg_token_len
FROM tokd"""
    )

    o["text_quality"] = (
        _DOC_TOKS_CTE
        + f""",
m AS (SELECT doc_id,
  len(toks) AS n_tok,
  greatest(length(text), 1) AS n_char,
  len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop,
  len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
  len(regexp_extract_all(text, '[0-9]')) AS n_digit
FROM tokd)
SELECT doc_id,
  round(n_stop / greatest(n_tok, 1), 6) AS stopword_ratio,
  round(n_punct / n_char, 6) AS punct_ratio,
  round(n_digit / n_char, 6) AS digit_ratio,
  round(0.4 * least(n_tok / 20.0, 1.0)
      + 0.3 * least((n_stop / greatest(n_tok, 1)) * 4, 1.0)
      + 0.15 * (1.0 - least((n_punct / n_char) * 5, 1.0))
      + 0.15 * (1.0 - least((n_digit / n_char) * 5, 1.0)), 6) AS quality
FROM m"""
    )

    # Gini/Lorenz: tied values make rank order engine-arbitrary, but the
    # statistics are tie-invariant (equal values contribute identically
    # whichever rank in the tie block they take).
    o["corpus_gini"] = """
WITH r AS (
  SELECT source, CAST(n_chars AS DECIMAL(18,6)) AS v,
         row_number() OVER (PARTITION BY source ORDER BY n_chars ASC) AS i
  FROM documents),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(v) AS DECIMAL(38,6)) AS sv,
    CAST(sum(CAST(i AS DECIMAL(19,0)) * v) AS DECIMAL(38,6)) AS siv
  FROM r GROUP BY 1)
SELECT source, n, round(CAST(sv AS DOUBLE), 6) AS total,
  round(CASE WHEN CAST(sv AS DOUBLE) > 0
        THEN 2.0 * CAST(siv AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END, 6) AS gini
FROM a"""

    o["corpus_lorenz"] = """
WITH r AS (
  SELECT source, CAST(n_chars AS DECIMAL(18,6)) AS v,
         row_number() OVER (PARTITION BY source ORDER BY n_chars ASC) AS i,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents),
p AS (
  SELECT source, CAST(ceil(i * 10 / CAST(n AS DOUBLE)) AS INT) AS decile,
         CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(v) AS DECIMAL(38,6)) AS m
  FROM r GROUP BY 1, 2)
SELECT source, decile, n_rows,
  round(CAST(m AS DOUBLE), 6) AS mass,
  round(CAST(sum(m) OVER (PARTITION BY source ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(sum(m) OVER (PARTITION BY source) AS DOUBLE), 6) AS cum_share
FROM p"""

    o["curation_allocation"] = """
WITH per AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS w FROM documents GROUP BY 1, 2),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM per),
st AS (SELECT source, lang, w, tw, (w * 1000) // tw AS flr, (w * 1000) % tw AS rem FROM per, tot),
lo AS (SELECT 1000 - sum(flr) AS leftover FROM st),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source, lang) AS rnk FROM st, lo)
SELECT source, lang, w AS stratum_weight,
  CAST(flr + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r"""

    # ESS reuses the text_quality oracle as a CTE (+ a doc_id join to
    # re-attach source); weights quantized to decimal(18,9) exactly as the
    # operator does, so the power sums are order-free on both engines.
    # quantile normalization: same integer bucket formulas as the Spark op
    # (ceil via div — no float percent_rank at bucket boundaries)
    _q_for_norm = o["text_quality"]
    o["curation_quantile_norm"] = f"""
WITH scored AS ({_q_for_norm}),
s AS (SELECT sc.doc_id, d.source, sc.quality FROM scored sc JOIN documents d USING (doc_id)),
g AS (SELECT quality AS v, doc_id,
        row_number() OVER (ORDER BY quality, doc_id) AS gr,
        count(*) OVER () AS gn
      FROM s),
lad AS (SELECT CAST((gr * 50 + gn - 1) // gn AS INT) AS bkt, max(v) AS norm FROM g GROUP BY 1),
st AS (SELECT doc_id, source, quality,
        row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS r,
        count(*) OVER (PARTITION BY source) AS n
       FROM s),
b AS (SELECT doc_id, source, quality,
        CASE WHEN n > 1 THEN CAST(greatest(1, ((r - 1) * 50 + n - 2) // (n - 1)) AS INT)
             ELSE 25 END AS q_bucket
      FROM st)
SELECT b.doc_id, b.source, b.quality, b.q_bucket,
       round(CAST(norm AS DOUBLE), 6) AS norm_value
FROM b JOIN lad ON b.q_bucket = lad.bkt"""


    _q_scored = o["text_quality"]
    o["mixture_ess"] = f"""
WITH scored AS ({_q_scored}),
w AS (SELECT d.source, CAST(round(s.quality, 9) AS DECIMAL(18,9)) AS w
      FROM scored s JOIN documents d USING (doc_id)),
a AS (SELECT source, count(w) AS n,
        CAST(sum(w) AS DECIMAL(28,9)) AS sw,
        CAST(sum(w * w) AS DECIMAL(38,18)) AS sw2
      FROM w GROUP BY 1)
SELECT source, n,
  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE), 6) AS ess,
  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE) / n, 6) AS ess_frac
FROM a"""

    o["corpus_diversity"] = f"""
WITH t AS (SELECT source, unnest({SQL_TOKS}) AS tok FROM documents),
c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(sum(c * (c - 1)) AS BIGINT) AS rep
      FROM c GROUP BY 1)
SELECT source, vocab, n_tokens,
  round(vocab / CAST(n_tokens AS DOUBLE), 6) AS type_token_ratio,
  round(CASE WHEN n_tokens > 1 THEN rep / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) END, 6) AS simpson,
  round(CASE WHEN rep > 0 AND n_tokens > 1
        THEN 1.0 / (rep / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)) END, 6) AS effective_vocab
FROM a"""


    scores = ",\n  ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}" for lang, pat in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    chain = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{la} = {best} THEN '{la}'" for la in langs
    ) + " END"
    o["text_lang_id"] = f"""
WITH s AS (SELECT doc_id,
  {scores}
FROM documents)
SELECT doc_id, {chain} AS lang_pred FROM s"""

    # language-ID evals reuse the lang_id oracle as a CTE
    _lid = o["text_lang_id"]
    o["lang_confusion"] = f"""
WITH pred AS ({_lid}),
j AS (SELECT d.lang AS label, p.lang_pred AS pred FROM documents d JOIN pred p USING (doc_id))
SELECT label, pred, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1, 2"""

    o["lang_report"] = f"""
WITH pred AS ({_lid}),
j AS (SELECT d.lang AS label, p.lang_pred AS pred FROM documents d JOIN pred p USING (doc_id)),
tp AS (SELECT label AS cls, count(*) AS tp FROM j WHERE label IS NOT DISTINCT FROM pred GROUP BY 1),
act AS (SELECT label AS cls, count(*) AS support FROM j GROUP BY 1),
prd AS (SELECT pred AS cls, count(*) AS n_predicted FROM j GROUP BY 1),
m AS (SELECT cls,
        CAST(coalesce(support, 0) AS BIGINT) AS support,
        CAST(coalesce(n_predicted, 0) AS BIGINT) AS n_predicted,
        CAST(coalesce(tp, 0) AS BIGINT) AS tp
      FROM act FULL OUTER JOIN prd USING (cls) LEFT JOIN tp USING (cls)),
r AS (SELECT *,
        CASE WHEN n_predicted > 0 THEN tp / CAST(n_predicted AS DOUBLE) END AS p_,
        CASE WHEN support > 0 THEN tp / CAST(support AS DOUBLE) END AS r_
      FROM m)
SELECT cls, support, n_predicted, tp,
  round(p_, 6) AS precision, round(r_, 6) AS recall,
  round(CASE WHEN p_ IS NOT NULL AND r_ IS NOT NULL AND (p_ + r_) > 0
        THEN 2.0 * p_ * r_ / (p_ + r_) END, 6) AS f1
FROM r"""

    o["text_fingerprint"] = (
        _DOC_TOKS_CTE
        + f""",
shing_list AS (SELECT doc_id, toks, {SQL_SHINGLES} AS shingles FROM tokd)
SELECT doc_id,
  {sql_h60("lower(array_to_string(toks, ' '))")} AS fp_exact,
  CASE WHEN len(shingles) > 0
       THEN list_aggregate(list_transform(shingles, s -> md5(s)), 'min')
       ELSE NULL END AS fp_shingle
FROM shing_list"""
    )

    # closed-form dHash: row y of the synthesized PNG ascends iff bit y of
    # doc_id is set, so its 7 gradient bits (positions 7y..7y+6) are all 1
    _dhash_expr = " + ".join(
        f"(CASE WHEN (doc_id >> {y}) & 1 = 1 THEN CAST({127 << (7 * y)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for y in range(8)
    )
    o["multimodal_png_dhash"] = f"SELECT doc_id, CAST({_dhash_expr} AS BIGINT) AS dhash FROM documents"

    o["multimodal_dhash_pairs"] = f"""
WITH sig AS (SELECT doc_id AS doc, CAST({_dhash_expr} AS BIGINT) AS sig FROM documents)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc < b.doc
WHERE bit_count(xor(a.sig, b.sig)) <= 7"""

    o["dedup_exact_incremental"] = (
        _DOC_TOKS_CTE
        + f""",
k AS (SELECT doc_id, {sql_h60("lower(array_to_string(toks, ' '))")} AS tk FROM tokd)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN (
  SELECT doc_id FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY tk) AS m FROM k)
  WHERE doc_id = m) keep USING (doc_id)"""
    )

    o["dedup_exact_docs"] = (
        _DOC_TOKS_CTE
        + f"""
SELECT {sql_h60("lower(array_to_string(toks, ' '))")} AS text_key,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM tokd GROUP BY 1"""
    )

    o["dedup_jaccard_pairs"] = (
        _SHINGLE_CTE
        + """,
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
  FROM shing a JOIN shing b USING (shingle)
  WHERE a.doc < b.doc GROUP BY 1, 2)
SELECT doc_a, doc_b, n_inter,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.4"""
    )

    o["dedup_containment_pairs"] = (
        _SHINGLE_CTE
        + """,
inter AS (
  SELECT a.doc AS da, b.doc AS db, count(*) AS n_inter
  FROM shing a JOIN shing b USING (shingle)
  WHERE a.doc < b.doc GROUP BY 1, 2),
sized AS (
  SELECT da, db, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b
  FROM inter JOIN sizes sa ON sa.doc = da JOIN sizes sb ON sb.doc = db),
directed AS (
  SELECT da AS doc_a, db AS doc_b, n_inter, n_a AS n_src FROM sized
  UNION ALL
  SELECT db AS doc_a, da AS doc_b, n_inter, n_b AS n_src FROM sized)
SELECT doc_a, doc_b, n_inter,
       round(n_inter / CAST(n_src AS DOUBLE), 6) AS containment
FROM directed
WHERE round(n_inter / CAST(n_src AS DOUBLE), 6) >= 0.5"""
    )

    _sniff_case = " ".join(
        f"WHEN {i} THEN '{m}'" for i, m in enumerate(_SNIFF_WANT)
    )
    o["multimodal_sniff"] = f"""
SELECT doc_id,
       CASE CAST(doc_id % 12 AS INT) {_sniff_case} END AS content_type
FROM documents"""

    o["curation_strata_sample"] = f"""
WITH d AS (
  SELECT doc_id, source, CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
         {sql_h60("'strata:' || CAST(doc_id AS VARCHAR)")} AS u
  FROM documents),
r AS (
  SELECT doc_id, source, len_bucket,
         row_number() OVER (PARTITION BY source, len_bucket
                            ORDER BY u ASC, doc_id ASC) AS strata_rank
  FROM d)
SELECT doc_id, source, len_bucket, CAST(strata_rank AS INT) AS strata_rank
FROM r WHERE strata_rank <= 5"""

    _cent_terms = ", ".join(
        f"avg(CAST(embedding[{i}] AS DOUBLE))" for i in range(1, 65)
    )
    cos_rc = sql_cosine("r.centroid", "c.centroid")
    o["embedding_drift"] = f"""
WITH s AS (
  SELECT 'g' || CAST(vec_id % 3 AS VARCHAR) AS grp_id,
         (vec_id % 2 = 0) AS cur, embedding
  FROM embeddings),
cent AS (
  SELECT grp_id, cur, [{_cent_terms}] AS centroid, count(*) AS n_rows
  FROM s GROUP BY 1, 2),
r AS (SELECT grp_id, centroid, n_rows FROM cent WHERE NOT cur),
c AS (SELECT grp_id, centroid, n_rows FROM cent WHERE cur)
SELECT coalesce(r.grp_id, c.grp_id) AS grp_id,
       coalesce(r.n_rows, 0) AS n_ref,
       coalesce(c.n_rows, 0) AS n_cur,
       CASE WHEN r.centroid IS NOT NULL AND c.centroid IS NOT NULL
            THEN {cos_rc} END AS centroid_cos
FROM r FULL JOIN c ON r.grp_id = c.grp_id"""

    o["events_window_diff"] = """
WITH sided AS (
  SELECT event_type, user_id % 50 AS user_bucket, (hour(ts) >= 12) AS cur
  FROM events),
c AS (
  SELECT event_type, user_bucket,
    CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM sided GROUP BY 1, 2)
SELECT event_type, user_bucket, n_ref, n_cur,
  CASE WHEN n_ref = 0 THEN 'new' WHEN n_cur = 0 THEN 'gone'
       WHEN n_cur > n_ref THEN 'grew' WHEN n_cur < n_ref THEN 'shrank'
       ELSE 'stable' END AS status,
  CASE WHEN n_ref > 0 THEN round(n_cur / CAST(n_ref AS DOUBLE), 6) END AS ratio
FROM c WHERE n_ref + n_cur >= 3"""

    o["profile_key_skew"] = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS k FROM c),
r AS (SELECT user_id, n,
             row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
      FROM c)
SELECT user_id, n,
       round(n / t.total, 6) AS frac,
       round(n * t.k / t.total, 6) AS skew_factor,
       CAST(rank AS INT) AS rank
FROM r, t WHERE rank <= 20"""

    o["profile_columns"] = "\nUNION ALL\n".join(
        f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  count(DISTINCT CASE WHEN {c} IS NOT NULL THEN {sql_h60(f'CAST({c} AS VARCHAR)')} END) AS n_distinct,
  round(avg(CASE WHEN {c} IS NOT NULL THEN len(CAST({c} AS VARCHAR)) END), 6) AS avg_len
FROM documents"""
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    )

    _track_re = "^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_eid|ref|ref_src)(=.*)?$"
    o["curation_url_canonical"] = f"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % 97 AS VARCHAR) AS pg FROM documents),
d AS (
  SELECT doc_id,
    ['http://example.com/p/' || pg,
     'HTTP://EXAMPLE.com:80/p/' || pg || '#frag',
     'http://example.com/p/' || pg || '?utm_source=x&utm_medium=y',
     'http://example.com/p/' || pg || '?b=2&a=1&gclid=z',
     'example.com/p/' || pg][CAST(doc_id % 5 AS INT) + 1] AS url
  FROM base),
s AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u FROM d),
p AS (
  SELECT doc_id, url,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS after
  FROM s),
q AS (
  SELECT *, lower(regexp_extract(after, '^([^/?]*)', 1)) AS hostport,
    substr(after, length(regexp_extract(after, '^([^/?]*)', 1)) + 1) AS pathq
  FROM p),
r AS (
  SELECT *,
    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
         ELSE hostport END AS host,
    CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
         ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
    regexp_extract(pathq, '^[^?]*\\?(.*)$', 1) AS query
  FROM q)
SELECT doc_id, url, canonical_url,
       {sql_h60('canonical_url')} AS url_key
FROM (
  SELECT doc_id, url,
    CASE WHEN scheme <> '' THEN scheme || '://' || host || path ||
      CASE WHEN qn <> '' THEN '?' || qn ELSE '' END END AS canonical_url
  FROM (
    SELECT *, array_to_string(list_sort(list_filter(
        regexp_split_to_array(query, '&'),
        x -> x <> '' AND NOT regexp_matches(lower(x), '{_track_re}'))), '&') AS qn
    FROM r) t1) t2"""

    o["dedup_minhash_lsh_pairs"] = (
        _SHINGLE_CTE
        + ",\n"
        + _minhash_sig_sql()
        + ",\n"
        + _lsh_bucket_sql()
        + """,
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.doc < b.doc),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN shing a ON a.doc = c.doc_a
  JOIN shing b ON b.doc = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.4"""
    )

    # keep-first rule: doc survives iff no smaller-id doc is a band-collision
    # candidate with verified Jaccard >= 0.4. Both the one-shot operator and
    # the 3-batch incremental path must produce exactly this set — the shared
    # oracle is what certifies incremental == batch.
    _keep_first_sql = (
        _SHINGLE_CTE
        + ",\n"
        + _minhash_sig_sql()
        + ",\n"
        + _lsh_bucket_sql()
        + """,
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.doc < b.doc),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN shing a ON a.doc = c.doc_a
  JOIN shing b ON b.doc = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
dropped AS (
  SELECT DISTINCT doc_b FROM inter
  JOIN sizes sa ON sa.doc = doc_a
  JOIN sizes sb ON sb.doc = doc_b
  WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.4)
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_b FROM dropped)"""
    )
    o["dedup_keep_first"] = _keep_first_sql
    o["dedup_keep_first_incremental"] = _keep_first_sql

    vote_cols = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(60)
    )
    pack_expr = " + ".join(f"CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(60))
    # mirrors operators/dedup.simhash: one groupBy(doc) with 60 vote sums,
    # bit packing as a projection — no per-bit row explosion
    o["dedup_simhash_pairs"] = (
        _DOC_TOKS_CTE
        + f""",
tok AS (SELECT doc_id AS doc, unnest(toks) AS tok FROM tokd),
h AS (SELECT doc, {sql_h60('tok')} AS h FROM tok),
votes AS (SELECT doc, {vote_cols} FROM h GROUP BY doc),
sig AS (SELECT doc, CAST({pack_expr} AS BIGINT) AS simhash FROM votes)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc < b.doc
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    )

    o["emb_quantized"] = """
WITH m AS (SELECT vec_id, embedding,
  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
FROM embeddings),
s AS (SELECT vec_id, embedding,
  CASE WHEN max_abs > 0 THEN max_abs / 127.0 ELSE 1.0 END AS scale FROM m)
SELECT vec_id, round(scale, 6) AS q_scale,
  array_to_string(list_transform(embedding,
    x -> CAST(CAST(round(CAST(x AS DOUBLE) / scale, 0) AS INT) AS VARCHAR)), ',') AS q_csv
FROM s"""

    o["lineitem_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(28,6)) AS sum_disc_price,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2"""

    o["tpch_shipping_priority"] = """
SELECT l_orderkey,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(28,6)) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10"""

    o["tpch_local_supplier_volume"] = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(28,6)) AS revenue
FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name"""

    # Poisson-bootstrap: the oracle re-derives the 32 deterministic weight
    # columns (portable h60 uniform -> Poisson(1) inverse CDF) and folds
    # replica means left-to-right exactly as the Spark F.aggregate does.
    from ..operators.profiling import _POIS1_CDF

    _cdf = "[" + ", ".join(repr(c) for c in _POIS1_CDF) + "]"
    _R = 32

    def _bu(r: int) -> str:
        return (
            f"(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{r}:boot'), 1, 15) AS BIGINT)"
            " / 1152921504606846976.0)"
        )

    _wcols = ",\n    ".join(
        f"len(list_filter({_cdf}, c -> c < {_bu(r)})) AS w{r}" for r in range(_R)
    )
    _aggs = ",\n    ".join(
        f"CAST(sum(CAST(w{r} AS DECIMAL(18,6)) * CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)"
        f" / sum(w{r}) AS m{r}"
        for r in range(_R)
    )
    _msum = " + ".join(f"m{r}" for r in range(_R))
    _vsum = " + ".join(f"(m{r} - mbar) * (m{r} - mbar)" for r in range(_R))
    o["corpus_bootstrap_ci"] = f"""
WITH w AS (
  SELECT n_chars,
    {_wcols}
  FROM documents),
a AS (
  SELECT count(*) AS n,
    CAST(sum(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS raw_mean,
    {_aggs}
  FROM w),
s AS (SELECT *, ({_msum}) / {_R}.0 AS mbar FROM a),
v AS (SELECT n, raw_mean, sqrt(({_vsum}) / {_R - 1}.0) AS se FROM s)
SELECT n, round(raw_mean, 6) AS est, round(se, 6) AS se,
       round(raw_mean - 1.96 * se, 6) AS ci_lo,
       round(raw_mean + 1.96 * se, 6) AS ci_hi
FROM v"""

    # The bloom prune is correctness-invisible (false positives die in the
    # equi-join), so the oracle is the PLAIN join.
    o["join_bloom_prune"] = """
SELECT l_orderkey, l_partkey, l_quantity, p_name
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size = 1"""

    def _fk_row(name: str, child: str, parent: str, ck: str, pk: str) -> str:
        return f"""
SELECT '{name}' AS fk,
  (SELECT count(*) FROM {child}) AS n_child,
  (SELECT count(*) FROM {child} WHERE {ck} IS NOT NULL) AS n_checkable,
  (SELECT count(*) FROM {child} c
     WHERE c.{ck} IS NOT NULL
       AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphans,
  (SELECT count(*) FROM {child} c
     WHERE c.{ck} IS NOT NULL
       AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) = 0 AS passed"""

    o["fk_summary"] = " UNION ALL ".join(
        [
            _fk_row("lineitem_orders", "lineitem", "orders", "l_orderkey", "o_orderkey"),
            _fk_row("orders_customer", "orders", "customer", "o_custkey", "c_custkey"),
            _fk_row("customer_nation", "customer", "nation", "c_nationkey", "n_nationkey"),
            _fk_row("events_supplier", "events", "supplier", "user_id", "s_suppkey"),
        ]
    )

    o["fk_orphan_rows"] = """
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE e.user_id IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = e.user_id)"""

    o["dedup_ngram_spans"] = (
        _DOC_TOKS_CTE
        + f""",
spans AS (
  SELECT doc_id AS doc, CAST(i - 1 AS INT) AS start_pos,
         {sql_h60("array_to_string(list_slice(toks, i, i + 4), ' ')")} AS ngram_hash
  FROM tokd, unnest(generate_series(1, len(toks) - 4)) AS t(i)
  WHERE len(toks) >= 5),
cnt AS (SELECT ngram_hash, count(DISTINCT doc) AS n_docs
        FROM spans GROUP BY 1 HAVING count(DISTINCT doc) >= 2)
SELECT s.doc, s.start_pos, s.ngram_hash, c.n_docs
FROM spans s JOIN cnt c USING (ngram_hash)"""
    )

    o["dedup_span_removal"] = (
        _DOC_TOKS_CTE
        + f""",
spans AS (
  SELECT doc_id AS doc, CAST(i - 1 AS INT) AS start_pos,
         {sql_h60("array_to_string(list_slice(toks, i, i + 4), ' ')")} AS ngram_hash
  FROM tokd, unnest(generate_series(1, len(toks) - 4)) AS t(i)
  WHERE len(toks) >= 5),
flag AS (SELECT ngram_hash, min(ROW(doc, start_pos)) AS keep
         FROM spans GROUP BY 1 HAVING count(DISTINCT doc) >= 2),
rm AS (SELECT DISTINCT s.doc, CAST(s.start_pos + u.j AS INT) AS pos
       FROM spans s JOIN flag f USING (ngram_hash),
            unnest(generate_series(0, 4)) AS u(j)
       WHERE ROW(s.doc, s.start_pos) <> f.keep),
rmagg AS (SELECT doc, count(*) AS n_rm FROM rm GROUP BY doc),
tokpos AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
           FROM tokd, unnest(generate_series(1, len(toks))) AS t(i)),
kept AS (SELECT tp.doc_id, tp.pos, tp.tok
         FROM tokpos tp LEFT JOIN rm ON rm.doc = tp.doc_id AND rm.pos = tp.pos
         WHERE rm.doc IS NULL),
clean AS (SELECT doc_id, count(*) AS n_kept,
                 string_agg(tok, ' ' ORDER BY pos) AS text_clean
          FROM kept GROUP BY doc_id)
SELECT t.doc_id AS doc,
       CAST(coalesce(r.n_rm, 0) AS BIGINT) AS removed_tokens,
       CAST(len(t.toks) - coalesce(r.n_rm, 0) AS BIGINT) AS kept_tokens,
       coalesce(c.text_clean, '') AS text_clean
FROM tokd t
LEFT JOIN rmagg r ON r.doc = t.doc_id
LEFT JOIN clean c ON c.doc_id = t.doc_id"""
    )

    o["text_chunks"] = (
        _DOC_TOKS_CTE
        + """,
p AS (SELECT doc_id, toks, greatest(len(toks), 1) AS n_tok FROM tokd),
c AS (SELECT doc_id, toks, CAST(ceil((n_tok - 4) / 12.0) AS INT) AS n_chunks FROM p),
ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
              list_slice(toks, i * 12 + 1, i * 12 + 16) AS chunk
       FROM c, unnest(generate_series(0, greatest(n_chunks, 1) - 1)) AS t(i))
SELECT doc_id, chunk_idx,
       array_to_string(chunk, ' ') AS chunk_text,
       CAST(len(chunk) AS BIGINT) AS chunk_tokens
FROM ch"""
    )

    o["container_parse"] = r"""
WITH l AS (SELECT doc_id,
  CASE WHEN doc_id % 2 = 0
    THEN '{"log":"' || text || '\n","stream":"stdout","time":"2024-01-01T00:00:00Z"}'
    ELSE '2024-01-01T00:00:00.000000000Z stderr F ' || text END AS line
FROM documents)
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'docker' ELSE 'cri' END AS container_format,
  CASE WHEN doc_id % 2 = 0 THEN json_extract_string(line, '$.time')
       ELSE regexp_extract(line, '^(\S+Z?) (stdout|stderr) ([PF]) (.*)$', 1) END AS log_time,
  CASE WHEN doc_id % 2 = 0 THEN json_extract_string(line, '$.stream')
       ELSE regexp_extract(line, '^(\S+Z?) (stdout|stderr) ([PF]) (.*)$', 2) END AS stream,
  CASE WHEN doc_id % 2 = 0 THEN 'F'
       ELSE regexp_extract(line, '^(\S+Z?) (stdout|stderr) ([PF]) (.*)$', 3) END AS partial_flag,
  CASE WHEN doc_id % 2 = 0 THEN regexp_replace(json_extract_string(line, '$.log'), '\n$', '')
       ELSE regexp_extract(line, '^(\S+Z?) (stdout|stderr) ([PF]) (.*)$', 4) END AS log
FROM l"""

    o["dedup_near_clusters"] = (
        _SHINGLE_CTE.replace("\nWITH ", "\nWITH RECURSIVE ", 1)
        + ",\n"
        + _minhash_sig_sql()
        + ",\n"
        + _lsh_bucket_sql()
        + """,
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.doc < b.doc),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN shing a ON a.doc = c.doc_a
  JOIN shing b ON b.doc = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
pairsv AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc = doc_a
  JOIN sizes sb ON sb.doc = doc_b
  WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.4),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairsv
          UNION SELECT doc_b, doc_a FROM pairsv),
reach AS (
  SELECT src AS doc, src AS label FROM edges
  UNION
  SELECT e.src AS doc, r.label AS label FROM edges e JOIN reach r ON r.doc = e.dst)
SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc"""
    )

    cos_ab = sql_cosine("a.embedding", "b.embedding")
    o["dedup_embedding_pairs"] = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos_ab} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos_ab} >= 0.35"""

    # IVF-cell-blocked near-dup pairs: top-2 cells per vector (multi-probe),
    # candidates share any cell, scored once after dedup — mirrors
    # operators/dedup.embedding_dup_pairs_bucketed
    cos_vc2 = sql_cosine("v.embedding", "c.centroid")
    o["dedup_embedding_pairs_bucketed"] = f"""
WITH cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_vc2} DESC, c.cell ASC) AS r
  FROM embeddings v CROSS JOIN cents c),
cells AS (SELECT vec_id, cell FROM scored WHERE r <= 2),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b USING (cell) WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, {cos_ab} AS cos
FROM cand
JOIN embeddings a ON a.vec_id = id_a
JOIN embeddings b ON b.vec_id = id_b
WHERE {cos_ab} >= 0.35"""

    o["dedup_semantic"] = f"""
WITH RECURSIVE cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT v.vec_id, c.cell, {cos_vc2} AS cc,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_vc2} DESC, c.cell ASC) AS r
  FROM embeddings v CROSS JOIN cents c),
cells AS (SELECT vec_id, cell FROM scored WHERE r <= 2),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b USING (cell) WHERE a.vec_id < b.vec_id),
pairsv AS (
  SELECT id_a, id_b FROM cand
  JOIN embeddings a ON a.vec_id = id_a
  JOIN embeddings b ON b.vec_id = id_b
  WHERE {cos_ab} >= 0.35),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairsv
          UNION SELECT id_b, id_a FROM pairsv),
reach AS (
  SELECT src AS doc, src AS label FROM edges
  UNION
  SELECT e.src AS doc, r.label AS label FROM edges e JOIN reach r ON r.doc = e.dst),
comp AS (SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc),
lab AS (
  SELECT s.vec_id AS doc, s.cell, s.cc AS centroid_sim,
         coalesce(c.cluster_rep, s.vec_id) AS cluster_rep
  FROM scored s LEFT JOIN comp c ON c.doc = s.vec_id
  WHERE s.r = 1),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_rep
                               ORDER BY centroid_sim ASC, doc ASC) AS rn
  FROM lab)
SELECT doc AS vec_id, cell, centroid_sim, cluster_rep, rn = 1 AS keep
FROM ranked"""

    # contrastive pair mining: exact (r=1) cell assignment, same-cell
    # directed candidates >= neg_floor, split at pos_threshold
    o["emb_contrastive_pairs"] = f"""
WITH cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, c.cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_vc2} DESC, c.cell ASC) AS r
    FROM embeddings v CROSS JOIN cents c) t WHERE r = 1),
cand AS (
  SELECT a.vec_id AS anchor_id, b.vec_id AS other_id, {cos_ab} AS cos
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
  WHERE {cos_ab} >= 0.2)
SELECT anchor_id, other_id, cos, 'pos' AS label, 0 AS rank
FROM cand WHERE cos >= 0.35
UNION ALL
SELECT anchor_id, other_id, cos, 'hard_neg' AS label, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos DESC, other_id ASC) AS rank
  FROM cand WHERE cos < 0.35) t
WHERE rank <= 3"""

    # leakage-safe split: same CC as dedup_near_clusters, then the
    # train_split hash band applied to the component representative
    o["dedup_keep_best"] = o["dedup_near_clusters"].replace(
        "SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc",
        """, comp AS (SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc),
alldocs AS (
  SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS rep, d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id),
win AS (
  SELECT doc_id, rep,
         row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, doc_id) AS rn
  FROM alldocs)
SELECT doc_id, rep AS cluster_rep, rn = 1 AS keep FROM win""",
    )

    o["dedup_cluster_sizes"] = o["dedup_near_clusters"].replace(
        "SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc",
        """, comp AS (SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc),
rep AS (
  SELECT coalesce(c.cluster_rep, d.doc_id) AS rep
  FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id),
sz AS (SELECT rep, count(*) AS cluster_size FROM rep GROUP BY rep),
hist AS (SELECT cluster_size, count(*) AS n_clusters FROM sz GROUP BY cluster_size)
SELECT cluster_size, n_clusters,
       cluster_size * n_clusters AS n_docs,
       round((cluster_size * n_clusters) /
             CAST(sum(cluster_size * n_clusters) OVER () AS DOUBLE), 6) AS frac_docs
FROM hist""",
    )

    o["leakage_split_docs"] = o["dedup_near_clusters"].replace(
        "SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc",
        """, comp AS (SELECT doc, min(label) AS cluster_rep FROM reach GROUP BY doc),
rep AS (
  SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS cluster_rep
  FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id)
SELECT doc_id, cluster_rep,
  CASE WHEN CAST('0x' || substr(md5('split:' || CAST(cluster_rep AS VARCHAR)), 1, 15) AS BIGINT)
            % 1000000 < 900000 THEN 'train' ELSE 'test' END AS split
FROM rep""",
    )

    o["source_overlap"] = f"""
WITH d AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror_' || source AS source, text FROM documents WHERE doc_id % 3 = 0),
keyed AS (SELECT DISTINCT source, {sql_h60('text')} AS k FROM d),
tot AS (SELECT source, count(*) AS n FROM keyed GROUP BY source),
ov AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_overlap
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.source <= b.source
  GROUP BY 1, 2)
SELECT src_a, src_b, n_overlap, ta.n AS n_a, tb.n AS n_b,
  round(n_overlap / CAST(ta.n AS DOUBLE), 6) AS frac_of_a,
  round(n_overlap / CAST(tb.n AS DOUBLE), 6) AS frac_of_b
FROM ov
JOIN tot ta ON ta.source = src_a
JOIN tot tb ON tb.source = src_b"""

    from ..operators.curation import recipe_targets as _recipe_targets_fn

    _recipe_targets = _recipe_targets_fn(
        {"src0": 0.6, "src1": 0.3, "src2": 0.1}, 2000
    )
    _recipe_case = " ".join(
        f"WHEN '{s}' THEN {t}" for s, t in sorted(_recipe_targets.items())
    )
    o["curation_recipe"] = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
         {sql_h60("'recipe:' || CAST(doc_id AS VARCHAR)")} AS u
  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
c AS (
  SELECT doc_id, source, n_tokens,
         coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         CASE source {_recipe_case} END AS target_tokens
  FROM d)
SELECT doc_id, source, n_tokens, CAST(target_tokens AS BIGINT) AS target_tokens
FROM c WHERE cum_before < target_tokens"""

    cos_qn = sql_cosine("q.embedding", "n.embedding")
    o["sim_recall_ivf"] = f"""
WITH bq AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
bscored AS (
  SELECT bq.query_id, n.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY bq.query_id
                            ORDER BY {sql_cosine("bq.embedding", "n.embedding")} DESC, n.vec_id ASC) AS rank
  FROM bq JOIN embeddings n ON n.vec_id <> bq.query_id),
exact AS (SELECT query_id, neighbor_id FROM bscored WHERE rank <= 5),
cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, c.cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {sql_cosine("v.embedding", "c.centroid")} DESC, c.cell ASC) AS r
    FROM embeddings v CROSS JOIN cents c) t WHERE r = 1),
iq AS (SELECT vec_id AS qid, embedding AS qv, cell AS qcell FROM assign WHERE vec_id % 50 = 0),
iranked AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY {sql_cosine("iq.qv", "a.embedding")} DESC, vec_id ASC) AS rank
  FROM iq JOIN assign a ON a.cell = iq.qcell AND a.vec_id <> iq.qid),
approx AS (SELECT qid AS query_id, vec_id AS neighbor_id FROM iranked WHERE rank <= 5),
hits AS (
  SELECT e.query_id, count(*) AS h
  FROM exact e JOIN approx a USING (query_id, neighbor_id) GROUP BY e.query_id)
SELECT q.query_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
       round(coalesce(h.h, 0) / 5.0, 6) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM exact) q LEFT JOIN hits h USING (query_id)"""

    o["sim_topk_brute"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id, {cos_qn} AS cos,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY {cos_qn} DESC, n.vec_id ASC) AS rank
  FROM q JOIN embeddings n ON n.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
FROM scored WHERE rank <= 5"""

    cos_vc = sql_cosine("v.embedding", "c.centroid")
    o["sim_topk_ivf"] = f"""
WITH cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, embedding, cell, cc AS cell_cos FROM (
    SELECT v.vec_id, v.embedding, c.cell, {cos_vc} AS cc,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_vc} DESC, c.cell ASC) AS r
    FROM embeddings v CROSS JOIN cents c) t WHERE r = 1),
q AS (SELECT vec_id AS qid, embedding AS qv, cell AS qcell FROM assign WHERE qid % 50 = 0),
cand AS (
  SELECT q.qid, a.vec_id, {sql_cosine('q.qv', 'a.embedding')} AS cos
  FROM q JOIN assign a ON a.cell = q.qcell AND a.vec_id <> q.qid),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM cand)
SELECT qid AS query_id, vec_id AS neighbor_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5"""

    # --- dictionary phrase tagging ----------------------------------------
    _dict_vals = ", ".join(f"('{t}', '{g}')" for t, g in _DICT_TERMS)
    o["text_dict_tags"] = f"""
WITH d AS (
  SELECT doc_id,
    list_filter(list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
      t -> regexp_replace(t, '^[^\\p{{L}}\\p{{Nd}}]+|[^\\p{{L}}\\p{{Nd}}]+$', '', 'g')), t -> t <> '') AS toks
  FROM documents),
dict(term, tag) AS (VALUES {_dict_vals}),
grams AS (
  SELECT doc_id, unnest(list_concat(list_concat(
      list_transform(generate_series(1, greatest(len(toks), 0)), i -> toks[i]),
      list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                     i -> toks[i] || ' ' || toks[i+1])),
      list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    )) AS gram
  FROM d),
m AS (SELECT g.doc_id, g.gram AS term, dict.tag FROM grams g JOIN dict ON dict.term = g.gram),
agg AS (
  SELECT doc_id, count(*) AS hits,
    array_to_string(list_sort(list_distinct(list(tag))), ',') AS tags_csv,
    array_to_string(list_sort(list_distinct(list(term))), ',') AS terms_csv
  FROM m GROUP BY doc_id)
SELECT doc.doc_id,
  CAST(coalesce(agg.hits, 0) AS BIGINT) AS hits,
  coalesce(agg.tags_csv, '') AS tags_csv,
  coalesce(agg.terms_csv, '') AS terms_csv
FROM documents doc LEFT JOIN agg USING (doc_id)"""

    # --- product quantization: encode + ADC top-k -------------------------
    # the d CTE is both the assignment table (v = any vector) and the
    # query LUT (v = a query): dist(vector v's subspace s, codeword c) in
    # exact integer micro-units — floor(d*1e6+0.5) matches the Spark fold
    _pq_dint = (
        "CAST(floor(list_sum(list_transform(generate_series(1, 16), i -> "
        "(CAST(v.embedding[s.s*16+i] AS DOUBLE) - CAST(c.cv[s.s*16+i] AS DOUBLE)) * "
        "(CAST(v.embedding[s.s*16+i] AS DOUBLE) - CAST(c.cv[s.s*16+i] AS DOUBLE))"
        ")) * 1000000 + 0.5) AS BIGINT)"
    )
    _pq_cte = f"""
WITH subs AS (SELECT unnest(generate_series(0, 3)) AS s),
cbv AS (SELECT CAST(vec_id AS INT) AS code, embedding AS cv FROM embeddings WHERE vec_id < 16),
d AS (
  SELECT v.vec_id, s.s, c.code, {_pq_dint} AS dint
  FROM embeddings v, subs s, cbv c),
best AS (
  SELECT vec_id, s, code,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY dint, code) AS rn
  FROM d)"""

    o["emb_pq_codes"] = f"""{_pq_cte}
SELECT vec_id, string_agg(CAST(code AS VARCHAR), '-' ORDER BY s) AS codes_csv
FROM best WHERE rn = 1 GROUP BY vec_id"""

    o["sim_topk_pq"] = f"""{_pq_cte},
codes AS (SELECT vec_id, s, code FROM best WHERE rn = 1),
adc AS (
  SELECT dq.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(dq.dint) AS BIGINT) AS adc_dist
  FROM codes c
  JOIN d dq ON dq.s = c.s AND dq.code = c.code
  WHERE dq.vec_id % 50 = 0 AND dq.vec_id <> c.vec_id
  GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
  FROM adc)
SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rank
FROM ranked WHERE rnk <= 5"""

    cos_vc2 = sql_cosine("v.embedding", "c.centroid")
    o["sim_topk_ivfpq"] = f"""{_pq_cte},
codes AS (SELECT vec_id, s, code FROM best WHERE rn = 1),
cents AS (SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_vc2} DESC, c.cell ASC) AS r
    FROM embeddings v CROSS JOIN cents c) t WHERE r = 1),
qprobe AS (
  SELECT qid, cell FROM (
    SELECT v.vec_id AS qid, c.cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {cos_vc2} DESC, c.cell ASC) AS r
    FROM embeddings v CROSS JOIN cents c WHERE v.vec_id % 50 = 0) t WHERE r <= 2),
adc AS (
  SELECT dq.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(dq.dint) AS BIGINT) AS adc_dist
  FROM codes c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN qprobe qp ON qp.cell = a.cell AND qp.qid <> c.vec_id
  JOIN d dq ON dq.vec_id = qp.qid AND dq.s = c.s AND dq.code = c.code
  GROUP BY 1, 2),
rankedq AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
  FROM adc)
SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rank
FROM rankedq WHERE rnk <= 5"""

    # recall of the compressed index vs exact — composes the two oracles
    # above as derived tables (DuckDB allows nested WITH in subqueries)
    o["sim_recall_ivfpq"] = f"""
WITH approx AS (SELECT query_id, neighbor_id FROM ({o['sim_topk_ivfpq']}) t1),
exact AS (SELECT query_id, neighbor_id FROM ({o['sim_topk_brute']}) t2),
hits AS (
  SELECT e.query_id, count(*) AS h
  FROM exact e JOIN approx a USING (query_id, neighbor_id) GROUP BY 1)
SELECT q.query_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
       round(coalesce(h.h, 0) / 5.0, 6) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM exact) q LEFT JOIN hits h USING (query_id)"""

    feats = ",\n  ".join(
        f"round(CAST('0x' || substr(md5(text), {2 * (i % 16) + 1}, 2) AS INT) / 255.0, 6) AS f{i}"
        for i in range(8)
    )
    o["multimodal_features"] = f"""
SELECT doc_id, 'image/png' AS media_type,
  CAST(strlen(text) AS BIGINT) AS payload_bytes,
  {feats}
FROM documents"""

    # ground truth from the synthesis parameters: n = 100 + (id%50)*10,
    # square-wave amplitude = RMS = 1000 + (id%7)*100, rate 8000 mono
    o["multimodal_wav_decode"] = """
SELECT doc_id,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  CAST(100 + (doc_id % 50) * 10 AS BIGINT) AS n_samples,
  CAST((100 + (doc_id % 50) * 10) * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(1000 + (doc_id % 7) * 100 AS DOUBLE) AS rms
FROM documents"""

    # ground truth: width = 1 + id%16, height = 1 + id%8, gray = mean = id%256
    o["multimodal_png_decode"] = """
SELECT doc_id,
  CAST(1 + doc_id % 16 AS INT) AS width,
  CAST(1 + doc_id % 8 AS INT) AS height,
  CAST(8 AS INT) AS bit_depth,
  CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
FROM documents"""

    # wav windows: synthesis params n = 100+(id%50)*10, amp = 1000+(id%7)*100,
    # 8 kHz mono; 25 ms windows = 200 samples. Square wave -> every window's
    # RMS is exactly the amplitude (integer square, exact double sqrt).
    o["multimodal_wav_windows"] = """
WITH p AS (SELECT doc_id,
             100 + (doc_id % 50) * 10 AS n,
             CAST(1000 + (doc_id % 7) * 100 AS DOUBLE) AS amp
           FROM documents),
w AS (SELECT doc_id, n, amp,
        unnest(range(0, CAST(ceil(n / 200.0) AS BIGINT))) AS win_idx
      FROM p)
SELECT doc_id,
  CAST(win_idx AS INT) AS win_idx,
  CAST(win_idx * 25 AS BIGINT) AS start_ms,
  CAST(least(200, n - win_idx * 200) AS BIGINT) AS win_samples,
  round(amp, 6) AS win_rms,
  FALSE AS is_silence
FROM w"""

    o["multimodal_frames"] = """
SELECT doc_id, CAST(unnest(generate_series(0,
         greatest(CAST(length(text) AS BIGINT) * 40 - 1, 0), 1000)) AS BIGINT) AS frame_ms
FROM documents"""

    return o


ORACLES: dict[str, str] = _oracles()
