"""Property-based tests (hypothesis) — the reference's fuzz-test mirror
(SURVEY.md §5.4: groupbyattrsprocessor/fuzz_test.go, logdedup fuzz_test.go).

Strategies generate small random transcript batches; properties assert the
structural invariants the pipeline must hold for EVERY input, not just the
fixtures: route partitioning, parse-bank totality, recombine reassembly,
sampler determinism.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "code", "calc", "none"]

texts = st.one_of(
    st.text(alphabet="abcdefghij XYZ=:{}0123456789", min_size=0, max_size=40),
    # adversarial payloads: embedded \x01 separator bytes, regex
    # metacharacters, newlines — the parse bank must never shift fields
    # (separator-collision guard in parse_native) or throw
    st.text(alphabet="ab\x01\\()[]{}.*+?|^$\n", min_size=0, max_size=24),
    # syslog-shaped line whose greedy message group captures the hostile
    # bytes — the exact collision the \x01 guard exists for
    st.builds(
        lambda m: f"2025-01-01T00:00:00 [INFO] comp: {m}",
        st.text(alphabet="ab\x01\\()[].*+?", min_size=0, max_size=16),
    ),
    st.builds(lambda s, t, n, ok: f"LOG lvl={s} tool={t} latency_ms={n} status={'ok' if ok else 'err'}",
              st.sampled_from(["info", "err", "debug"]), st.sampled_from(TOOLS),
              st.integers(0, 9999), st.booleans()),
    st.builds(lambda e, n: f'{{"event":"{e}","tokens":{n},"model":"alpha-1"}}',
              st.sampled_from(["tool_call", "retry"]), st.integers(0, 999)),
)

rows = st.lists(
    st.tuples(
        st.sampled_from(["c1", "c2", "c3"]),            # conv_id
        st.integers(0, 30),                              # turn_idx
        st.sampled_from(ROLES),
        texts,
        st.sampled_from(TOOLS),
        st.integers(0, 10**6),                           # ts offset seconds
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])


def _df(spark, data):
    base = dt.datetime(2025, 1, 1)
    rws = [(c, t, r, x, tl, base + dt.timedelta(seconds=s)) for (c, t, r, x, tl, s) in data]
    return spark.createDataFrame(rws, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")


@given(data=rows)
@settings(**_SETTINGS)
def test_route_partition_property(spark, dims, data):
    """Every row lands in EXACTLY one move sink; copy sinks are subsets."""
    from opentelemetry_collector_contrib_spark.operators.enrich import enrich_transcripts
    from opentelemetry_collector_contrib_spark.operators.parse import parse_native
    from opentelemetry_collector_contrib_spark.operators.route import FIXTURE_ROUTES, apply_routes, sink_frames

    tool_dim, role_dim = dims
    routed = apply_routes(enrich_transcripts(parse_native(_df(spark, data)), tool_dim, role_dim), FIXTURE_ROUTES)
    total = routed.count()
    sinks = sink_frames(routed, FIXTURE_ROUTES)
    move_total = sum(sinks[name].count() for name in ("errors", "tool_events", "general"))
    assert move_total == total
    assert sinks["human_turns"].count() <= total


@given(data=rows)
@settings(**_SETTINGS)
def test_parse_bank_total_and_exclusive(spark, data):
    """Every row gets exactly one pattern_id; 'raw' rows carry no parsed
    fields; kv rows always carry sev+status."""
    from opentelemetry_collector_contrib_spark.operators.parse import parse_native

    out = parse_native(_df(spark, data))
    assert out.filter(F.col("pattern_id").isNull()).count() == 0
    raw = out.filter(F.col("pattern_id") == "raw")
    assert raw.filter(F.col("sev").isNotNull() | F.col("status").isNotNull() | F.col("tokens").isNotNull()).count() == 0
    kv = out.filter(F.col("pattern_id") == "kv")
    assert kv.filter(F.col("sev").isNull() | F.col("status").isNull()).count() == 0


@given(data=rows)
@settings(**_SETTINGS)
def test_native_vectorized_parse_agree(spark, data):
    """The Catalyst bank and the pandas-UDF bank are interchangeable."""
    from opentelemetry_collector_contrib_spark.operators.parse import parse_native, parse_vectorized

    df = _df(spark, data)
    cols = ["conv_id", "turn_idx", "text", "pattern_id", "sev", "latency_ms", "status", "tokens"]
    a = sorted([tuple(r) for r in parse_native(df).select(cols).collect()])
    b = sorted([tuple(r) for r in parse_vectorized(df).select(cols).collect()])
    assert a == b


@given(data=rows)
@settings(**_SETTINGS)
def test_sampler_consistency(spark, data):
    """probabilistic_sampler gives the same verdict to every row of a conv."""
    from opentelemetry_collector_contrib_spark.operators.filter import probabilistic_sampler

    df = _df(spark, data)
    kept = probabilistic_sampler(df, "conv_id", 50.0)
    kept_convs = {r["conv_id"] for r in kept.select("conv_id").distinct().collect()}
    for conv, n_in in [(r["conv_id"], r["n"]) for r in df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()]:
        n_kept = kept.filter(F.col("conv_id") == conv).count()
        assert n_kept in (0, n_in)
        assert (n_kept > 0) == (conv in kept_convs)


def test_recombine_reassembles_exactly(spark):
    """Segment-sum recombine loses nothing: concatenating all segments in
    order reproduces the per-conv ordered text sequence."""
    import random

    from opentelemetry_collector_contrib_spark.operators.recombine import recombine

    rng = random.Random(7)
    data = []
    for conv in ("a", "b"):
        for i in range(25):
            data.append((conv, i, f"line-{conv}-{i}", rng.random() < 0.3 or i == 0))
    df = spark.createDataFrame(data, "conv_id string, seq int, text string, first boolean")
    out = recombine(df, "conv_id", "seq", F.col("first"))
    for conv in ("a", "b"):
        segs = sorted(
            [(r["first_order"], r["combined"]) for r in out.filter(F.col("conv_id") == conv).collect()]
        )
        rebuilt = "\n".join(c for _o, c in segs).split("\n")
        assert rebuilt == [f"line-{conv}-{i}" for i in range(25)]


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    h=st.integers(0, 99),
    m=st.integers(0, 59),
    s=st.integers(0, 59),
    ms=st.integers(0, 999),
)
def test_duration_parser_roundtrip(spark, h, m, s, ms):
    """Duration('XhYmZsWms') == X*3600 + Y*60 + Z + W/1000 for every
    combination (the Go-duration grammar the converter must honor)."""
    from opentelemetry_collector_contrib_spark.functions.ottl import OTTL_FUNCTIONS as O

    text = f"{h}h{m}m{s}s{ms}ms"
    got = spark.range(1).select(O["Duration"](F.lit(text)).alias("d")).collect()[0]["d"]
    assert got == pytest.approx(h * 3600 + m * 60 + s + ms / 1000)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=rows, target=st.integers(1, 5))
def test_adaptive_sampler_cap_property(spark, data, target):
    """Every key keeps min(volume, target) rows, and the kept set is a
    subset of the input — for every input."""
    from opentelemetry_collector_contrib_spark.operators.filter import adaptive_head_sampler

    df = spark.createDataFrame(
        [(c, i, r, t, tool, off) for (c, i, r, t, tool, off) in data],
        "conv_id string, turn_idx int, role string, text string, tool string, off long",
    ).dropDuplicates(["conv_id", "turn_idx"])
    out = adaptive_head_sampler(df, ["role"], target, tiebreak_cols=["conv_id", "turn_idx"])
    in_counts = {r["role"]: r["n"] for r in df.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()}
    out_counts = {r["role"]: r["n"] for r in out.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()}
    for role, n in in_counts.items():
        assert out_counts.get(role, 0) == min(n, target)
    kept = {(r["conv_id"], r["turn_idx"]) for r in out.select("conv_id", "turn_idx").collect()}
    allr = {(r["conv_id"], r["turn_idx"]) for r in df.select("conv_id", "turn_idx").collect()}
    assert kept <= allr


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40))
def test_h60_matches_python_hashlib(spark, s):
    """The portable 60-bit hash every dedup/sampling oracle rests on must
    equal int(md5(utf8)[:15], 16) for arbitrary strings."""
    import hashlib

    from opentelemetry_collector_contrib_spark.operators.textstats import h60

    got = spark.createDataFrame([(s,)], "x string").select(h60(F.col("x")).alias("h")).collect()[0]["h"]
    want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    assert got == want


# --- time-series operator properties (operators/timeseries.py) --------------

ts_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),                  # key
        st.integers(0, 5000),                            # left ts offset s
    ),
    min_size=1,
    max_size=20,
)
ts_right = st.lists(
    st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 5000), st.integers(0, 99)),
    min_size=0,
    max_size=20,
)


@given(left=ts_rows, right=ts_right)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, left, right):
    """asof_join == per-row argmax(right.ts <= left.ts) for every input,
    including empty right sides, duplicate left timestamps, and exact ties."""
    from opentelemetry_collector_contrib_spark.operators.timeseries import asof_join

    base = dt.datetime(2025, 1, 1)
    # dedupe right on (key, ts): the operator contract requires unique right
    # keys per timestamp (ties are engine-dependent otherwise)
    rmap = {}
    for k, s, v in right:
        rmap[(k, s)] = max(v, rmap.get((k, s), -1))
    ldf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "event_id bigint, k string, ts timestamp",
    )
    rdf_rows = [(k, base + dt.timedelta(seconds=s), float(v)) for (k, s), v in sorted(rmap.items())]
    if not rdf_rows:
        rdf_rows = [("__none__", base, 0.0)]  # createDataFrame needs >=1 row; key never matches
    rdf = spark.createDataFrame(rdf_rows, "k string, ts timestamp, v double")

    got = {
        r["event_id"]: (r["v"], r["asof_ts"])
        for r in asof_join(ldf, rdf, ["k"], "ts", ["v"]).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [(rs, v) for (rk, rs), v in rmap.items() if rk == k and rs <= s]
        if cands:
            rs, v = max(cands)
            assert got[i] == (float(v), base + dt.timedelta(seconds=rs))
        else:
            assert got[i] == (None, None)


@given(data=st.lists(st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 40000)), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_rollup_gapfill_invariants(spark, data):
    """Gapfill spine is dense per key; zero-filled buckets sum to nothing;
    locf equals the most recent non-empty bucket's total."""
    from opentelemetry_collector_contrib_spark.operators.timeseries import rollup_gapfill

    base = dt.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), 1.0) for k, s in data],
        "k string, ts timestamp, value double",
    )
    out = rollup_gapfill(df, ["k"], "ts", bucket_s=3600, value_col="value").collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r)
    for k, rs in per_key.items():
        rs.sort(key=lambda r: r["bucket_s"])
        buckets = [r["bucket_s"] for r in rs]
        assert buckets == list(range(buckets[0], buckets[-1] + 1, 3600))  # dense spine
        assert sum(r["n"] for r in rs) == sum(1 for kk, _ in data if kk == k)  # counts conserved
        last = None
        for r in rs:
            if r["n"] > 0:
                last = r["total"]
            assert r["locf_total"] == last  # LOCF carries the last observed total


# --- incremental keep-first dedup == one-shot, for ANY id-ordered split ------
# Random small corpora over a tiny vocabulary (to force near-dups), random
# batch boundaries: the union of per-batch novel sets must equal the
# one-shot keep-first result. Exercises tombstones, within-batch chains,
# and empty batches in one invariant.

_vocab = ["alpha", "bravo", "charlie", "delta", "echo"]


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.lists(st.sampled_from(_vocab), min_size=3, max_size=6), min_size=2, max_size=10
    ),
    cut1=st.integers(0, 10),
    cut2=st.integers(0, 10),
)
def test_incremental_keep_first_equals_one_shot(spark, data, cut1, cut2):
    from opentelemetry_collector_contrib_spark.operators.dedup import (
        dedup_keep_first,
        dedup_keep_first_incremental,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(bands=8, rows=1, threshold=0.5)

    one_shot = {r["doc_id"] for r in dedup_keep_first(df, "doc_id", **kw).collect()}

    lo, hi = sorted((cut1 % (len(data) + 1), cut2 % (len(data) + 1)))
    state, kept = None, set()
    for a, b in ((0, lo), (lo, hi), (hi, len(data))):
        batch = df.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b))
        novel, state = dedup_keep_first_incremental(batch, state, "doc_id", **kw)
        kept |= {r["doc_id"] for r in novel.collect()}
    assert kept == one_shot


# --- OTTL compiler fuzz: malformed statements fail CLEANLY -------------------
# Arbitrary 100 TB config/input must produce ValueError (the compiler's
# documented contract), never an IndexError/KeyError/RecursionError leaking
# from the lexer or recursive-descent parser.


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    src=st.text(
        alphabet='abcXYZ_0123456789()[]{},."\'=><!+-*/ \t\\%$#@;:`~|&^\n\x01é€',
        min_size=0,
        max_size=60,
    )
)
def test_ottl_compiler_rejects_garbage_cleanly(spark, src):
    from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
        parse_condition,
        parse_statement,
    )

    for fn in (parse_statement, parse_condition):
        try:
            fn(src)
        except ValueError:
            pass  # the documented malformed-input contract
        # any other exception type propagates and fails the test


# --- metricstarttime adjuster vs a literal Python port -----------------------

_series_values = st.lists(
    st.one_of(st.none(), st.floats(min_value=0, max_value=100, allow_nan=False)),
    min_size=1,
    max_size=12,
)


def _adjust_reference(values):
    """Literal port of subtractinitial/adjuster.go adjustMetricSum for one
    series: (kept_index, adjusted_value, start_index_or_reset_marker).
    Timestamps are indices; a reset start is (i, 'reset')."""
    out = []
    ref = None  # (ref_value, start_marker)
    prev_recorded = None
    for i, v in enumerate(values):
        if ref is None:
            ref = (v, ("init", i))
            prev_recorded = v if v is not None else prev_recorded
            continue  # first point dropped
        if v is None:
            out.append((i, None, ref[1]))  # NoRecordedValue: as-is, no updates
            continue
        if prev_recorded is not None and v < prev_recorded:
            ref = (0.0, ("reset", i))
            out.append((i, v, ref[1]))
        else:
            rv = ref[0]
            out.append((i, v - rv if rv is not None else None, ref[1]))
        prev_recorded = v
    return out


@given(values=_series_values)
@settings(**_SETTINGS)
def test_start_time_subtract_matches_literal_adjuster(spark, values):
    from opentelemetry_collector_contrib_spark.operators.aggregate import start_time_adjust

    base = dt.datetime(2025, 1, 1)
    rws = [("s", i, base + dt.timedelta(seconds=10 * i), v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rws, "k string, i int, ts timestamp, value double")
    got = {
        r["i"]: r
        for r in start_time_adjust(df, ["k"], ["i"], strategy="subtract_initial_point").collect()
    }
    want = _adjust_reference(values)
    assert set(got) == {i for i, _, _ in want}
    base_us = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    for i, adj, (kind, j) in want:
        g = got[i]
        if adj is None:
            assert g["adjusted"] is None
        else:
            assert g["adjusted"] == pytest.approx(adj)
        expected_start = base_us + 10_000_000 * j - (1000 if kind == "reset" else 0)
        assert g["start_ts_us"] == expected_start, (i, kind, j)


# --- stanza chain config fuzz: malformed operator lists fail CLEANLY ----------

_fuzz_keys = st.sampled_from([
    "type", "regex", "parse_from", "parse_to", "field", "fields", "from",
    "to", "expr", "routes", "header", "layout", "keys", "on_error",
    "protocol", "is_first_entry", "source_identifier", "order_field",
])
_fuzz_vals = st.one_of(
    st.text(alphabet='ab(?P<x>)[]{}.*+\\"= ', max_size=20),
    st.integers(-5, 5),
    st.none(),
    st.booleans(),
    st.lists(st.text(max_size=5), max_size=3),
)


_fuzz_op = st.one_of(
    st.dictionaries(_fuzz_keys, _fuzz_vals, max_size=5),
    # force a VALID type so every per-type validation branch gets fuzzed
    # garbage for its other keys, not just the unknown-type early exit
    st.builds(
        lambda t, rest: {**rest, "type": t},
        st.sampled_from([
            "regex_parser", "json_parser", "csv_parser", "key_value_parser",
            "severity_parser", "time_parser", "add", "remove", "copy",
            "move", "retain", "flatten", "filter", "router",
            "syslog_parser", "assign_keys", "unquote", "regex_replace",
            "recombine", "noop",
        ]),
        st.dictionaries(_fuzz_keys, _fuzz_vals, max_size=4),
    ),
)


@settings(max_examples=300, deadline=None)
@given(ops=st.lists(_fuzz_op, max_size=3))
def test_stanza_chain_validation_rejects_garbage_cleanly(ops):
    """Arbitrary operator-list configs must produce ValueError (the
    documented build-time contract), never a KeyError/TypeError/re.error
    leaking from the validator."""
    from opentelemetry_collector_contrib_spark.plans.stanza_chain import validate_stanza_ops

    try:
        validate_stanza_ops(ops)
    except ValueError:
        pass  # the documented malformed-config contract
    # any other exception type propagates and fails the test


# --- service/spec validator fuzz: same ValueError-only contract --------------

_cfg_vals = st.recursive(
    st.one_of(st.text(max_size=10), st.integers(-5, 5), st.none(), st.booleans()),
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(st.sampled_from([
            "type", "dims", "source", "receivers", "exporters", "spec",
            "path", "table", "routes", "condition", "name", "mode",
            "default", "kind", "key", "percent", "policies", "include",
            "exclude", "match_type", "attributes", "record", "transform",
            "filter", "sample", "tail_sampling", "filter_match", "order",
            "stanza_operators", "stanza_operators_post", "parse", "enrich",
            "aggregates",
        ]), kids, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=300, deadline=None)
@given(service=st.dictionaries(st.sampled_from(["pipelines", "connectors"]), _cfg_vals, max_size=2))
def test_validate_service_rejects_garbage_cleanly(service):
    from opentelemetry_collector_contrib_spark.plans.config import validate_service

    try:
        validate_service(service)
    except ValueError:
        pass  # the documented malformed-config contract


@settings(max_examples=300, deadline=None)
@given(spec=st.dictionaries(st.sampled_from([
    "source", "parse", "transform", "filter", "filter_match", "routes",
    "order", "sample", "tail_sampling", "stanza_operators",
    "stanza_operators_post", "enrich", "aggregates",
]), _cfg_vals, max_size=4))
def test_validate_spec_rejects_garbage_cleanly(spec):
    from opentelemetry_collector_contrib_spark.plans.config import validate_spec

    try:
        validate_spec(spec)
    except ValueError:
        pass  # the documented malformed-config contract


@settings(max_examples=300, deadline=None)
@given(cfg=st.dictionaries(
    st.sampled_from(["receivers", "processors", "connectors", "service", "exporters"]),
    _cfg_vals,
    max_size=3,
))
def test_collector_yaml_shim_rejects_garbage_cleanly(cfg):
    """Arbitrary collector-shaped configs (the public YAML surface) must
    raise ValueError, never KeyError/AttributeError/TypeError leaks."""
    import yaml as _yaml

    from opentelemetry_collector_contrib_spark.plans.collector_config import (
        spec_from_collector_yaml,
    )

    try:
        spec_from_collector_yaml(_yaml.safe_dump(cfg), source_path="/tmp/x")
    except ValueError:
        pass  # the documented malformed-config contract


# --- transcript-QA invariants (operators/conv_qa.py) -------------------------


@given(data=rows)
@settings(**_SETTINGS)
def test_conv_digest_is_input_order_invariant(spark, data):
    """conv_exact_dedup digests depend only on (turn_idx-ordered) content,
    never on row arrival order — the property that makes the digest a
    valid cache/versioning key across re-ingests."""
    from opentelemetry_collector_contrib_spark.operators.conv_qa import conv_exact_dedup

    a = {r.conv_id: r.digest for r in conv_exact_dedup(_df(spark, data)).collect()}
    b = {
        r.conv_id: r.digest
        for r in conv_exact_dedup(_df(spark, list(reversed(data)))).collect()
    }
    assert a == b


@given(data=rows)
@settings(**_SETTINGS)
def test_cloned_conversation_shares_digest(spark, data):
    from opentelemetry_collector_contrib_spark.operators.conv_qa import conv_exact_dedup

    clone = [("c1clone", t, r, x, tl, s) for (c, t, r, x, tl, s) in data if c == "c1"]
    if not clone:
        return
    out = {r.conv_id: r for r in conv_exact_dedup(_df(spark, data + clone)).collect()}
    assert out["c1clone"].digest == out["c1"].digest
    assert out["c1clone"].group_size >= 2 and out["c1clone"].is_dup is True


@given(data=rows)
@settings(**_SETTINGS)
def test_retry_chains_partition_error_rows(spark, data):
    """Chains partition the err tool rows exactly: failure counts sum to
    the number of err rows, and chain index ranges never overlap within
    a (conv, tool) group."""
    from opentelemetry_collector_contrib_spark.operators.conv_qa import tool_retry_chains

    df = _df(spark, data)
    chains = tool_retry_chains(df).collect()
    n_err = df.filter(
        (F.col("tool") != "none")
        & (F.regexp_extract("text", r"status=(\w+)", 1) == "err")
    ).count()
    assert sum(c.n_failures for c in chains) == n_err
    by_group: dict = {}
    for c in chains:
        by_group.setdefault((c.conv_id, c.tool), []).append(c)
    for group in by_group.values():
        group.sort(key=lambda c: c.chain_start)
        for prev_c, next_c in zip(group, group[1:]):
            assert prev_c.chain_end < next_c.chain_start


@given(data=rows)
@settings(**_SETTINGS)
def test_curation_gate_is_the_conjunction(spark, data):
    from opentelemetry_collector_contrib_spark.operators.conv_qa import (
        conv_exact_dedup,
        role_sequence_qa,
        tool_retry_chains,
        transcript_curation_gate,
    )

    df = _df(spark, data)
    gate = {r.conv_id: r for r in transcript_curation_gate(df).collect()}
    qa = {r.conv_id: r.qa_pass for r in role_sequence_qa(df).collect()}
    dup = {r.conv_id: r.is_dup for r in conv_exact_dedup(df).collect()}
    mx: dict = {}
    for c in tool_retry_chains(df).collect():
        mx[c.conv_id] = max(mx.get(c.conv_id, 0), c.n_failures)
    for cid, r in gate.items():
        assert r.eligible == (qa[cid] and not dup[cid] and mx.get(cid, 0) < 3)
