"""Data-shape profilers: the diagnostics a 100 TB pipeline runs BEFORE
committing to a partitioning or join strategy.

Two operators:

- ``key_skew_profile`` — the pre-join skew check. Every groupBy/join in
  this engine shuffles on its keys; one hot key (the north rule's skewed
  conversations) decides whether the salted path (`aggregate.salted_agg`)
  or AQE skew-join splitting is needed. This profiler answers that with
  numbers: the top-N keys by row count, each with its share of the table
  and its multiple of the uniform-key expectation (``skew_factor`` —
  a key at 1.0 is average; a key at 500 melts an executor).

- ``column_profile`` — the ANALYZE TABLE shape: per-column row/null/
  distinct counts and average rendered width, feeding join-side choice
  (is the dim broadcastable?), dictionary-encoding decisions, and
  contract drift checks (a column whose null fraction jumps is the
  classic silent upstream break; compose with `plans/contracts.py` for
  the gating version).

Reference counterpart: the collector exposes pipeline self-observability
via obsreport/telemetry counters (accepted/refused/dropped per
processor); a columnar engine's equivalent introspection is data-shape
statistics. These are engine extensions in the same spirit as
`plans/metrics.py`'s job counters.

Scale notes are on each function; both shuffle fixed-width rows only
(hashes and lengths, never payload strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import h60


def key_skew_profile(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Top-``top_n`` key tuples by frequency with skew diagnostics.

    Output: (*keys, n, frac, skew_factor, rank) —
      frac        = n / total_rows
      skew_factor = n / (total_rows / n_distinct_keys), the multiple of
                    the uniform expectation (rounded 6)
      rank        = 1-based dense position by (n desc, keys asc)

    Plan shape: ONE hash aggregate on the keys (map-side combined), then
    the (total, n_keys) scalars come from a 1-row aggregate over the
    counts frame collected driver-side and inlined as literals — the
    justified-tiny-collect pattern (2 scalars, never data rows; a
    literal-key join would plan a BroadcastNestedLoopJoin). The top-N
    rank is a row_number over the counts frame that Spark rewrites to
    TakeOrderedAndProject(limit=top_n): each map task forwards its own
    top ``top_n`` candidates and the driver merges, so no global sort of
    the key universe happens even with billions of distinct keys (the
    residual single-partition Window then numbers only those ≤ top_n
    survivors). Plan-asserted in tests/test_profiling.py."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    tot_row = counts.select(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("k")
    ).collect()[0]
    total, n_keys = int(tot_row["t"] or 0), int(tot_row["k"] or 0)
    if total == 0:
        return counts.select(
            *keys,
            "n",
            F.lit(None).cast("double").alias("frac"),
            F.lit(None).cast("double").alias("skew_factor"),
            F.lit(None).cast("int").alias("rank"),
        ).limit(0)
    w = Window.orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            *keys,
            "n",
            F.round(F.col("n") / F.lit(float(total)), 6).alias("frac"),
            F.round(
                F.col("n") * F.lit(float(n_keys)) / F.lit(float(total)), 6
            ).alias("skew_factor"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column stats in ONE pass over ONE scan: (column, n_rows,
    n_null, n_distinct, avg_len) — n_distinct counts distinct NON-NULL
    values; avg_len is the average rendered (string-cast) width of
    non-null values, rounded 6 (NULL when the column is all-NULL).

    Plan shape: the table melts to one fixed-width row per (row, column)
    — (name, h60(value), len, is_null), an inline explode of a struct
    array, so the shuffle carries 8-byte hashes and ints, never the
    payload strings — then one groupBy(column) with a single distinct
    aggregate: partial dedup on (column, hash) before the first
    exchange, merge, then the final #cols-key exchange. Two exchanges
    total, both over fixed-width pre-deduped rows; a per-column
    multi-count(DISTINCT) formulation would instead Expand the scan
    #cols× AND replay it per aggregate. Cost is #cols × rows melt inside
    the scan stage.

    Caveat: n_distinct is hash-distinct (h60 — md5-derived, 60 bits);
    collisions are ~n²/2⁶¹, negligible below ~10⁹ distinct values per
    column and identical across engines (the DuckDB oracle hashes the
    same way). Rendered widths for doubles/timestamps are
    engine-specific — profile those as their raw semantics demand, but
    oracle-gate only int/string columns."""
    names = cols or df.columns
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                h60(F.col(c).cast("string")).alias("h"),
                F.length(F.col(c).cast("string")).alias("l"),
                F.col(c).isNull().alias("z"),
            )
            for c in names
        ]
    )
    melted = df.select(F.explode(entries).alias("e")).select("e.*")
    return (
        melted.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("z").cast("bigint")).alias("n_null"),
            F.count_distinct(F.when(~F.col("z"), F.col("h"))).alias("n_distinct"),
            F.round(F.avg(F.when(~F.col("z"), F.col("l"))), 6).alias("avg_len"),
        )
        .select("column", "n_rows", "n_null", "n_distinct", "avg_len")
    )


def json_path_profile(
    df: DataFrame,
    json_col: str,
    max_depth: int = 4,
    out_cols: tuple[str, str, str] = ("path", "jtype", "n"),
) -> DataFrame:
    """Schema-on-read profiler for a semi-structured JSON column: walk
    every document's JSON tree (to `max_depth`) and count occurrences of
    each (path, type) — the inventory pass that tells a pipeline what
    shape its `props`/tool-args payloads actually have before anyone
    writes `from_json` schemas. Paths use the JSONPath-ish convention
    `$.a.b`, with array elements collapsed to `$.a[*]` (element schemas
    matter, indices don't). Types: object/array/string/number/boolean/
    null; malformed JSON counts under the synthetic path `$` with type
    `malformed`.

    Shape: Arrow-batched mapInPandas walker (JSON traversal has no
    Catalyst equivalent) emitting fixed-width (path, type) rows, then one
    hash aggregation — the shuffle carries path strings and counts, never
    payloads. Scale: per-row work is linear in payload size; the result
    is as small as the key-space, like column_profile."""
    import json as _json

    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(out_cols[0], T.StringType()),
            T.StructField(out_cols[1], T.StringType()),
        ]
    )

    def walk(batches: "_Iterator[_pd.DataFrame]") -> "_Iterator[_pd.DataFrame]":
        def jtype(v) -> str:
            if v is None:
                return "null"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, list):
                return "array"
            return "object"

        for pdf in batches:
            rows: list[tuple[str, str]] = []

            def visit(node, path: str, depth: int) -> None:
                rows.append((path, jtype(node)))
                if depth >= max_depth:
                    return
                if isinstance(node, dict):
                    for k, v in node.items():
                        visit(v, f"{path}.{k}", depth + 1)
                elif isinstance(node, list):
                    for v in node:
                        visit(v, f"{path}[*]", depth + 1)

            for raw in pdf[json_col]:
                if raw is None:
                    continue
                try:
                    visit(_json.loads(raw), "$", 0)
                except (ValueError, RecursionError):
                    rows.append(("$", "malformed"))
            yield _pd.DataFrame(rows, columns=[out_cols[0], out_cols[1]])

    paths = df.select(json_col).mapInPandas(walk, schema)
    return paths.groupBy(out_cols[0], out_cols[1]).agg(
        F.count(F.lit(1)).alias(out_cols[2])
    )


# --- Poisson-bootstrap confidence intervals ---------------------------------
# Cumulative CDF of Poisson(1) at k = 0..7: a weight >7 has probability
# ~1e-8 — beyond the 60-bit uniform's useful resolution for corpus QA.
_POIS1_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
]
def bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    replicas: int = 32,
    seed: str = "boot",
    z: float = 1.96,
) -> DataFrame:
    """Poisson-bootstrap standard error / CI for a corpus mean in ONE pass.

    The classic bootstrap resamples the corpus B times — impossible at
    100 TB. The Poisson approximation (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google 2012) gives each row an
    independent Poisson(1) weight per replica, so all B resamples fold
    into a single aggregation: per replica r, the weighted (Σw·v, Σw)
    pair; replica means then yield the bootstrap SE. No shuffle of row
    data beyond the one aggregation; B only widens the aggregate row.

    Weights are DETERMINISTIC — the portable h60(id:replica:seed) uniform
    inverted through the Poisson(1) CDF — so the oracle (and any rerun)
    reproduces the interval exactly. Returns one row: n rows, the plain
    mean `est`, bootstrap `se`, and the z·se interval [ci_lo, ci_hi].
    """
    if replicas < 2:
        raise ValueError("replicas must be >= 2")
    v = F.col(value_col).cast("decimal(18,6)")
    cdf = F.lit(_POIS1_CDF)

    def w(r: int) -> Column:
        from .textstats import u60

        u = u60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(r)), F.lit(seed)))
        return F.size(F.filter(cdf, lambda c: c < u))

    # exact-decimal corpus sum: avg(double) is summation-order-sensitive
    # across partitions, which the cross-engine parity hash can't tolerate
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("decimal(28,6)").alias("_sv"),
    ]
    for r in range(replicas):
        wr = w(r)
        aggs.append(F.sum(wr.cast("decimal(18,6)") * v).alias(f"_s{r}"))
        aggs.append(F.sum(wr).cast("long").alias(f"_w{r}"))
    one = df.agg(*aggs).withColumn(
        "raw_mean", F.col("_sv").cast("double") / F.col("n")
    )
    means = F.array(
        *[
            (F.col(f"_s{r}").cast("double") / F.col(f"_w{r}"))
            for r in range(replicas)
        ]
    )
    mbar = F.aggregate(means, F.lit(0.0), lambda a, x: a + x) / F.lit(replicas)
    var = F.aggregate(
        means, F.lit(0.0), lambda a, x: a + (x - mbar) * (x - mbar)
    ) / F.lit(replicas - 1)
    se = F.sqrt(var)
    return one.select(
        F.col("n"),
        F.round("raw_mean", 6).alias("est"),
        F.round(se, 6).alias("se"),
        F.round(F.col("raw_mean") - F.lit(z) * se, 6).alias("ci_lo"),
        F.round(F.col("raw_mean") + F.lit(z) * se, 6).alias("ci_hi"),
    )


# --- Benford first-digit audit ----------------------------------------------
# P(d) = log10(1 + 1/d), d = 1..9 — precomputed so no runtime logs.
_BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_audit(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/truncated-data screen for metric pipelines: a
    gauge that suddenly stops being Benford-ish (when it was) usually
    means clamping, unit bugs, or synthetic backfill upstream.

    One projection extracts the first digit of floor(|v|) — INTEGER
    renderings are engine-identical, unlike double→string (e-notation
    thresholds differ), and no log10 touches the value, so zero
    transcendental parity risk. One hash agg counts per digit; the χ²
    distance against the Benford expectation uses precomputed literal
    probabilities. Rows with |v| < 1 or NULL lack an integer first digit
    and are excluded (reported in n_skipped)."""
    keys = by or []
    mag = F.floor(F.abs(F.col(value_col))).cast("bigint")
    fd = F.substring(mag.cast("string"), 1, 1)
    staged = df.select(
        *keys, F.when(mag >= 1, fd.cast("int")).alias("_d")
    )
    counts = staged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_d").isNull().cast("int")).cast("bigint").alias("n_skipped"),
        *[
            F.sum((F.col("_d") == d).cast("int")).cast("bigint").alias(f"d{d}")
            for d in range(1, 10)
        ],
    )
    n = (F.col("n_rows") - F.col("n_skipped")).cast("double")
    chi2 = None
    for i, p in enumerate(_BENFORD_P, start=1):
        term = (F.col(f"d{i}") - n * p) * (F.col(f"d{i}") - n * p) / (n * p)
        chi2 = term if chi2 is None else chi2 + term
    return counts.select(
        *keys,
        (F.col("n_rows") - F.col("n_skipped")).cast("bigint").alias("n_used"),
        "n_skipped",
        *[f"d{d}" for d in range(1, 10)],
        F.round(F.when(n > 0, chi2), 6).alias("benford_chi2"),
    )


# --- concentration: Gini + Lorenz deciles -----------------------------------
def gini_concentration(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Gini coefficient of how unevenly `value_col` mass is spread across
    rows (docs, sources, conversations) — the corpus-inequality number
    behind "90% of tokens come from 5% of documents". Uses the exact
    rank formulation over values sorted ascending (ties broken by the
    sort's stability → value asc is enough since equal values contribute
    identically): G = (2·Σ i·v_i) / (n·Σv) − (n+1)/n, in [0, 1).

    Integer/decimal-exact: ranks are integers, values decimal-summed;
    the two divisions at the end are double. One sort window per group +
    one hash agg. NULL for groups with zero total mass."""
    keys = by or []
    v = F.col(value_col).cast("decimal(18,6)")
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    ranked = df.select(*keys, v.alias("_v"), F.row_number().over(w).alias("_i"))
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_v").cast("decimal(38,6)").alias("_sv"),
        F.sum(F.col("_i").cast("decimal(18,0)") * F.col("_v")).cast("decimal(38,6)").alias("_siv"),
    )
    n = F.col("n").cast("double")
    sv = F.col("_sv").cast("double")
    siv = F.col("_siv").cast("double")
    gini = F.when(sv > 0.0, 2.0 * siv / (n * sv) - (n + 1.0) / n)
    return agg.select(*keys, "n", F.round(sv, 6).alias("total"), F.round(gini, 6).alias("gini"))


def lorenz_deciles(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Lorenz curve at decile resolution: rows sorted by value ascending,
    cumulative mass share at each population decile — the table behind
    the Gini number ("the bottom 50% of docs hold 8% of tokens"). One
    row per (group, decile 1..10) with cum_share monotone to 1.0.
    Integer/decimal-exact like gini_concentration."""
    keys = by or []
    v = F.col(value_col).cast("decimal(18,6)")
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    grp = Window.partitionBy(*keys)
    ranked = df.select(
        *keys,
        v.alias("_v"),
        F.row_number().over(w).alias("_i"),
        F.count(F.lit(1)).over(grp).alias("_n"),
    )
    dec = F.ceil(F.col("_i") * 10 / F.col("_n")).cast("int")
    per = ranked.select(*keys, dec.alias("decile"), "_v").groupBy(*keys, "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("_v").cast("decimal(38,6)").alias("_m"),
    )
    cum = (
        Window.partitionBy(*keys).orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*keys)
    return per.select(
        *keys,
        "decile",
        "n_rows",
        F.round(F.col("_m").cast("double"), 6).alias("mass"),
        F.round(
            F.sum("_m").over(cum).cast("double") / F.sum("_m").over(tot).cast("double"),
            6,
        ).alias("cum_share"),
    )
