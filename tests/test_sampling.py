"""OTEP-235 consistent sampling: pkg/sampling + probabilisticsampler modes.

Vectors mirror pkg/sampling/{probability,threshold,encoding}_test.go and
processor/probabilisticsamplerprocessor/sampler_mode.go semantics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import sampling as S


# --- driver-side mirrors -------------------------------------------------

# TestProbabilityToThresholdWithPrecision (probability_test.go:190-292)
PRECISION_CASES = [
    (1 - 0x456789A * 2**-28, "456789a", ["45678a", "45679", "4568", "456", "45", "4"]),
    (
        1 - 0x456789A * 2**-40,
        "000456789a",
        ["00045678a", "00045679", "0004568", "000456", "00045", "0004"],
    ),
    (
        1 - 0x789ABCDEF * 2**-40,
        "0789abcdef",
        ["0789abcdef", "0789abcdf", "0789abce", "0789abd", "0789ac", "0789b", "078a", "079", "08"],
    ),
    (
        1 - 0x12345678 * 2**-32,
        "12345678",
        ["1234568", "123456", "12345", "1234", "123", "12", "1"],
    ),
    (1 - 0x80801 * 2**-28, "0080801", ["00808", "008"]),
    (1, "0", ["0"]),
]


def test_probability_to_threshold_precision_table():
    for prob, exact, rounded in PRECISION_CASES:
        th = S.probability_to_threshold(prob)
        assert S.threshold_to_tvalue(th) == exact
        for want in rounded:
            prec = len(want.lstrip("0"))
            rth = S.probability_to_threshold(prob, prec)
            assert S.threshold_to_tvalue(rth) == want, (prob, prec)


def test_tvalue_examples():
    # encoding_test.go:64-124 + threshold_test.go examples
    assert S.threshold_to_tvalue(S.probability_to_threshold(2**-56)) == "ffffffffffffff"
    assert S.threshold_to_tvalue(S.probability_to_threshold(1 - 0x54 * 2**-8)) == "54"
    assert S.threshold_to_tvalue(S.probability_to_threshold(1 - 2**-8)) == "01"
    assert S.threshold_probability(S.tvalue_to_threshold("c")) == 0.25
    assert S.threshold_probability(S.tvalue_to_threshold("444")) == 1 - 0x444 * 2**-12
    with pytest.raises(ValueError):
        S.probability_to_threshold(2**-57)
    with pytest.raises(ValueError):
        S.tvalue_to_threshold("f" * 15)


def test_should_sample_examples():
    # ExampleThreshold_ShouldSample{,_traceid} (threshold_test.go:50-86)
    tv = S.tvalue_to_threshold("c")
    rv = int("d29d6a7215ced0", 16)
    assert tv <= rv  # sampled
    tid = "abababababababababd29d6a7215ced0"
    rnd56 = int(tid[18:], 16)
    assert rnd56 == rv
    assert S.adjusted_count(tv) == 4.0
    assert S.adjusted_count(S.NEVER_SAMPLE_THRESHOLD) == 0.0


def test_rvalue_roundtrip():
    for x in [0, 1, 0xAABBCCDDEEFF, S.MAX_ADJUSTED_COUNT - 1]:
        assert int(S.randomness_to_rvalue(x), 16) == x
        assert len(S.randomness_to_rvalue(x)) == 14
    assert S.randomness_to_rvalue(S.MAX_ADJUSTED_COUNT) == ""


def test_fnv1a32_reference():
    # FNV-1a canonical vectors (no seed bytes): hash of "" is the offset
    # basis; "a" -> 0xe40c292c (public FNV test vectors)
    assert S.fnv1a32(b"", seed=None or 0) != S.FNV_OFFSET_BASIS32  # seed bytes included
    # raw FNV-1a without the seed prefix, computed inline:
    h = S.FNV_OFFSET_BASIS32
    for b in b"a":
        h = ((h ^ b) * S.FNV_PRIME32) & S.MASK32
    assert h == 0xE40C292C


def test_randomness_from_bytes_structure():
    rnd = S.randomness_from_bytes(b"some-key", seed=22)
    assert 0 <= rnd < S.MAX_ADJUSTED_COUNT
    h32 = S.fnv1a32(b"some-key", 22)
    hashed = h32 & 0x3FFF
    assert rnd & 0x3FFF == hashed
    assert (rnd >> 42) == 0x3FFF - hashed


def test_hash_seed_threshold():
    # sampler_mode.go:430-446: uint32(pct*163.84) truncation
    assert S.hash_seed_threshold(100) == 0
    assert S.hash_seed_threshold(0.001) == S.NEVER_SAMPLE_THRESHOLD  # scaled = 0
    th = S.hash_seed_threshold(25)
    assert th == (0x4000 - 4096) << 42


# --- column kernels vs python mirrors ------------------------------------

def test_column_kernels_match_python(spark):
    rows = [
        ("c", "d29d6a7215ced0"),
        ("8", "00000000000000"),
        ("ffffffffffffff", "fffffffffffffe"),
        ("0", "80000000000000"),
        ("000456789a", "0004567899ffff"),
        ("zz", "short"),  # malformed both
    ]
    df = spark.createDataFrame(rows, "tv string, rv string")
    out = df.select(
        S.tvalue_threshold_col(F.col("tv")).alias("th"),
        S.rvalue_randomness_col(F.col("rv")).alias("rnd"),
        S.threshold_tvalue_col(S.tvalue_threshold_col(F.col("tv"))).alias("tv2"),
        S.adjusted_count_col(S.tvalue_threshold_col(F.col("tv"))).alias("adj"),
    ).collect()
    for (tv, rv), r in zip(rows, out):
        try:
            want_th = S.tvalue_to_threshold(tv)
        except ValueError:
            want_th = None
        want_rnd = int(rv, 16) if len(rv) == 14 and all(c in "0123456789abcdef" for c in rv) else None
        assert r.th == want_th
        assert r.rnd == want_rnd
        if want_th is not None:
            assert r.tv2 == S.threshold_to_tvalue(want_th)
            assert r.adj == pytest.approx(S.adjusted_count(want_th))


def test_probability_to_threshold_col_matches_python(spark):
    probs = [p for p, _, _ in PRECISION_CASES[:-1]] + [0.5, 0.25, 1 / 3, 0.1, 1e-3, 1.0]
    for prec in (0, 3, 4, 14):
        df = spark.createDataFrame([(p,) for p in probs], "p double")
        got = df.select(S.probability_to_threshold_col(F.col("p"), prec).alias("th")).collect()
        for p, r in zip(probs, got):
            assert r.th == S.probability_to_threshold(p, prec), (p, prec)


def test_fnv_randomness_col_matches_python(spark):
    keys = ["", "a", "user:42", "conv-000123", "abababababababababd29d6a7215ced0"]
    for seed in (0, 22):
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got = df.select(
            S.fnv1a32_col(F.col("k"), seed).alias("h"),
            S.randomness_from_key_col(F.col("k"), seed).alias("rnd"),
        ).collect()
        for k, r in zip(keys, got):
            assert r.h == S.fnv1a32(k.encode(), seed), (k, seed)
            assert r.rnd == S.randomness_from_bytes(k.encode(), seed), (k, seed)


def test_trace_id_randomness_col(spark):
    rows = [
        ("abababababababababd29d6a7215ced0",),
        ("0" * 32,),
        ("not-a-trace-id",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "tid string")
    got = df.select(S.trace_id_randomness_col(F.col("tid")).alias("r")).collect()
    assert got[0].r == int("bd29d6a7215ced0"[1:], 16)
    assert got[1].r is None and got[2].r is None and got[3].r is None


def test_tracestate_parse(spark):
    rows = [
        ("vendorA=x,ot=rv:d29d6a7215ced0;th:c,vendorB=y", "t1" + "0" * 30),
        ("ot=th:8", "abababababababababd29d6a7215ced0"),
        ("other=only", "abababababababababd29d6a7215ced0"),
        ("ot=rv:tooshort;th:c", "abababababababababd29d6a7215ced0"),
    ]
    df = spark.createDataFrame(rows, "ts string, tid string")
    out = S.parse_sampling_state(df, "ts", "tid").collect()
    assert out[0].rvalue == "d29d6a7215ced0" and out[0].tvalue == "c"
    assert out[0].randomness == int("d29d6a7215ced0", 16)
    assert out[0].threshold_in == S.tvalue_to_threshold("c")
    assert out[1].rvalue is None and out[1].tvalue == "8"
    assert out[1].randomness == int("bd29d6a7215ced0"[1:], 16)
    assert out[2].ot_section is None and out[2].threshold_in is None
    # malformed rv falls back to the trace id; th still parses
    assert out[3].rvalue is None and out[3].randomness == int("d29d6a7215ced0", 16)
    assert out[3].tvalue == "c"


# --- sampler modes --------------------------------------------------------

def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, trace_id string, tv string, rv string, pri double")


def _tid(rnd56: int) -> str:
    return "ab" * 9 + format(rnd56, "014x")


def test_equalizing_mode(spark):
    half = S.probability_to_threshold(0.5)  # 80000000000000 -> tvalue "8"
    rows = [
        (1, _tid(int("90000000000000", 16)), None, None, None),  # rnd >= th -> keep
        (2, _tid(int("10000000000000", 16)), None, None, None),  # dropped
        (3, _tid(int("f0000000000000", 16)), "c", None, None),   # incoming smaller prob kept
        (4, _tid(int("90000000000000", 16)), "4", None, None),   # raised to 8
        (5, _tid(int("10000000000000", 16)), "4", None, None),   # inconsistent? 4<=1? no -> err
    ]
    out = S.consistent_sample(
        _mk(spark, rows), 50, "equalizing", tvalue_col="tv", rvalue_col="rv", fail_closed=True
    )
    got = {r.id: r for r in out.collect()}
    assert set(got) == {1, 3, 4}
    assert got[1].sampling_threshold == S.threshold_to_tvalue(half) == "8"
    assert got[1].adjusted_count == 2.0
    assert got[3].sampling_threshold == "c" and got[3].adjusted_count == 4.0
    assert got[4].sampling_threshold == "8"
    # fail-open keeps the inconsistent record with threshold cleared -> "0"
    out_open = S.consistent_sample(
        _mk(spark, rows), 50, "equalizing", tvalue_col="tv", rvalue_col="rv", fail_closed=False
    )
    got_open = {r.id: r for r in out_open.collect()}
    assert 5 in got_open and got_open[5].sampling_threshold == "0"


def test_proportional_mode(spark):
    rows = [
        (1, _tid(int("f0000000000000", 16)), None, None, None),
        (2, _tid(int("f0000000000000", 16)), "8", None, None),  # 0.5 in -> 0.25 out
        (3, _tid(int("10000000000000", 16)), None, None, None),  # dropped (rnd < 8...)
    ]
    out = S.consistent_sample(
        _mk(spark, rows), 50, "proportional", tvalue_col="tv", rvalue_col="rv"
    )
    got = {r.id: r for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1].sampling_threshold == "8" and got[1].adjusted_count == 2.0
    assert got[2].sampling_threshold == "c" and got[2].adjusted_count == 4.0


def test_hash_seed_mode(spark):
    rows = [(i, None, None, None, None) for i in range(2000)]
    df = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(2000)], "id long, key string"
    )
    out = S.consistent_sample(
        df, 25, "hash_seed", trace_id_col=None, hash_key_col="key", hash_seed=22
    ).collect()
    th = S.hash_seed_threshold(25)
    expect = {
        i for i in range(2000) if S.randomness_from_bytes(f"key-{i}".encode(), 22) >= th
    }
    assert {r.id for r in out} == expect
    # acceptance rate near 25%
    assert 0.2 < len(out) / 2000 < 0.3
    for r in out[:5]:
        assert r.sampling_threshold == S.threshold_to_tvalue(th)
        assert int(r.sampling_randomness, 16) >= th


def test_priority_override(spark):
    rows = [
        (1, _tid(int("10000000000000", 16)), None, None, 100.0),  # forced keep
        (2, _tid(int("90000000000000", 16)), None, None, 0.0),    # no priority
        (3, _tid(int("90000000000000", 16)), None, None, 25.0),   # th=c > rnd9 -> drop
    ]
    out = S.consistent_sample(
        _mk(spark, rows), 50, "equalizing", tvalue_col="tv", rvalue_col="rv",
        priority_col="pri",
    )
    got = {r.id: r for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1].sampling_threshold == "0" and got[1].adjusted_count == 1.0


def test_never_sampler_with_priority(spark):
    rows = [
        (1, _tid(123), None, None, 100.0),
        (2, _tid(456), None, None, None),
    ]
    out = S.consistent_sample(
        _mk(spark, rows), 0, "equalizing", tvalue_col="tv", rvalue_col="rv",
        priority_col="pri",
    ).collect()
    assert [r.id for r in out] == [1]


def test_missing_randomness_fail_modes(spark):
    rows = [(1, None, None, None, None), (2, _tid(int("90000000000000", 16)), None, None, None)]
    closed = S.consistent_sample(
        _mk(spark, rows), 50, "equalizing", tvalue_col="tv", rvalue_col="rv", fail_closed=True
    ).collect()
    assert [r.id for r in closed] == [2]
    opened = S.consistent_sample(
        _mk(spark, rows), 50, "equalizing", tvalue_col="tv", rvalue_col="rv", fail_closed=False
    ).collect()
    assert {r.id for r in opened} == {1, 2}


def test_adjusted_count_conservation(spark):
    """Sum of adjusted counts over the sample estimates the population
    (the whole point of OTEP-235 adjusted counts)."""
    n = 20000
    df = spark.createDataFrame(
        [(i, _tid(S.randomness_from_bytes(str(i).encode()))) for i in range(n)],
        "id long, trace_id string",
    )
    out = S.consistent_sample(df, 10, "equalizing", precision=14)
    total = out.agg(F.sum("adjusted_count")).collect()[0][0]
    assert total == pytest.approx(n, rel=0.1)


def test_tailsampling_probabilistic_tracestate(spark):
    """probabilistic.go EvaluateWithThreshold under usetracestate: ot info
    -> OTEP-235 decision (explicit rv beats TraceID randomness); no info
    -> legacy hash fallback."""
    from opentelemetry_collector_contrib_spark.operators.recombine import (
        tail_sampling_policies,
    )

    high = "f0000000000000"
    low = "10000000000000"
    rows = [
        # trace A: rv says sample (rnd high vs 25% threshold 0xc0...)
        ("A", _tid(1), f"ot=rv:{high}", "2024-01-01 00:00:00"),
        ("A", _tid(1), None, "2024-01-01 00:00:01"),
        # trace B: rv low -> not sampled despite tid randomness being high
        ("B", _tid(int(high, 16)), f"ot=rv:{low}", "2024-01-01 00:00:00"),
        # trace C: th-only info -> OTEP path on tid randomness (high -> keep)
        ("C", _tid(int(high, 16)), "ot=th:c", "2024-01-01 00:00:00"),
        # trace D: th-only info, tid randomness low -> drop
        ("D", _tid(int(low, 16)), "ot=th:c", "2024-01-01 00:00:00"),
        # trace E: no info -> legacy hash path decides
        ("E", _tid(int(high, 16)), None, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "trace string, tid string, tracestate string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = tail_sampling_policies(
        df,
        [
            {
                "name": "prob",
                "type": "probabilistic_tracestate",
                "percent": 25,
                "tracestate_col": "tracestate",
                "trace_id_hex_col": "tid",
            }
        ],
        trace_col="trace",
        ts_col="ts",
    )
    got = {r.trace: r.sampled for r in out.collect()}
    assert got["A"] is True
    assert got["B"] is False
    assert got["C"] is True
    assert got["D"] is False
    from opentelemetry_collector_contrib_spark.operators.textstats import h60
    legacy = df.filter(F.col("trace") == "E").select(h60(F.col("trace")).alias("h")).collect()[0].h
    assert got["E"] == (legacy < int(0.25 * (1 << 60)))


def test_tailsampling_tracestate_no_randomness_falls_back_to_legacy(spark):
    """A trace carrying ot info (th only) but with NEITHER an rv NOR a
    32-hex trace id has no randomness source: it must fall back to the
    legacy hash, not coalesce randomness to 0 and never sample (round-5
    review — the default trace_id_hex_col is the conv-id column, which is
    rarely hex in this data model)."""
    from opentelemetry_collector_contrib_spark.operators.recombine import (
        tail_sampling_policies,
    )
    from opentelemetry_collector_contrib_spark.operators.textstats import h60

    rows = [(f"conv-{i:04d}", "ot=th:c", "2024-01-01 00:00:00") for i in range(64)]
    df = spark.createDataFrame(rows, "trace string, tracestate string, ts string")         .withColumn("ts", F.col("ts").cast("timestamp"))
    out = tail_sampling_policies(
        df,
        [{"name": "prob", "type": "probabilistic_tracestate", "percent": 25,
          "tracestate_col": "tracestate"}],  # trace_id_hex_col defaults to trace
        trace_col="trace", ts_col="ts",
    )
    got = {r.trace: r.sampled for r in out.collect()}
    th = int(0.25 * (1 << 60))
    legacy = {
        r.trace: r.h < th
        for r in df.select("trace", h60(F.col("trace")).alias("h")).distinct().collect()
    }
    assert got == legacy
    assert any(got.values()) and not all(got.values())  # ~25%, not all-drop


def test_streaming_consistent_sample_matches_batch(spark, tmp_path):
    """The sampler is a stateless projection+filter, so it composes with
    readStream unchanged: an availableNow drain must equal the batch run
    over the same parquet spool."""
    spool = str(tmp_path / "spool")
    spark.createDataFrame(
        [
            (i, _tid(S.randomness_from_bytes(str(i).encode())),
             ["8", "c", None, "zz"][i % 4], None, None)
            for i in range(200)
        ],
        "id long, trace_id string, tv string, rv string, pri double",
    ).write.parquet(spool)

    def pipe(df):
        return S.consistent_sample(
            df, 50, "equalizing", tvalue_col="tv", rvalue_col="rv", fail_closed=False
        ).select("id", "sampling_threshold", "sampling_randomness", "adjusted_count")

    schema = "id long, trace_id string, tv string, rv string, pri double"
    sdf = pipe(spark.readStream.schema(schema).parquet(spool))
    assert sdf.isStreaming
    (
        sdf.writeStream.format("memory").queryName("samp_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start().awaitTermination(60)
    )
    got = sorted(tuple(r) for r in spark.table("samp_stream").collect())
    want = sorted(tuple(r) for r in pipe(spark.read.parquet(spool)).collect())
    assert got == want and len(got) > 0


def test_max_min_fair_share_water_filling(spark):
    from opentelemetry_collector_contrib_spark.operators.sampling import max_min_fair_share

    # demands 2, 4, 10, 10 with capacity 20: 2 and 4 fully served,
    # the two big tenants split the remaining 14 -> 7 each
    df = spark.createDataFrame(
        [("a", 2.0), ("b", 4.0), ("c", 10.0), ("d", 10.0)], "t string, demand double"
    )
    out = {r["t"]: r for r in max_min_fair_share(df, ["t"], "demand", 20.0).collect()}
    assert out["a"]["share"] == 2.0 and not out["a"]["capped"]
    assert out["b"]["share"] == 4.0 and not out["b"]["capped"]
    assert out["c"]["share"] == 7.0 and out["c"]["capped"]
    assert out["d"]["share"] == 7.0 and out["d"]["capped"]
    assert sum(r["share"] for r in out.values()) == pytest.approx(20.0)

    # capacity exceeds total demand -> everyone satisfied
    out2 = {r["t"]: r for r in max_min_fair_share(df, ["t"], "demand", 100.0).collect()}
    assert all(not r["capped"] for r in out2.values())
    assert sum(r["share"] for r in out2.values()) == pytest.approx(26.0)

    # zero capacity -> every tenant capped at level 0
    out3 = {r["t"]: r for r in max_min_fair_share(df, ["t"], "demand", 0.0).collect()}
    assert all(r["capped"] and r["share"] == 0.0 for r in out3.values())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        max_min_fair_share(df, ["t"], "demand", -1.0)
