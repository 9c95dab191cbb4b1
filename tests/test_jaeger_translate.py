"""Jaeger tag-convention translation tables — mirrors the status/kind
cases of pkg/translator/jaeger/jaegerproto_to_traces_test.go over the
decoded tag-CSV model."""

from opentelemetry_collector_contrib_spark.operators.spans import jaeger_tags_to_otlp


def _run(spark, tags_csv):
    df = spark.createDataFrame([(1, tags_csv)], "i int, jt_tags_csv string")
    return jaeger_tags_to_otlp(df).collect()[0]


def test_kind_mapping_and_consumption(spark):
    r = _run(spark, "a=1,span.kind=producer")
    assert r["otlp_kind"] == "producer" and r["attrs_rest_csv"] == "a=1"
    assert not r["otlp_status_set"]
    r2 = _run(spark, "span.kind=weird")
    assert r2["otlp_kind"] == "unspecified" and r2["attrs_rest_csv"] == ""
    r3 = _run(spark, None)
    assert r3["otlp_kind"] == "unspecified" and r3["attrs_rest_csv"] == ""


def test_error_tag_wins_and_consumes_description(spark):
    r = _run(spark, "error=true,otel.status_code=Ok,otel.status_description=boom")
    assert r["otlp_status_set"] and r["otlp_status_code"] == "error"
    assert r["otlp_status_message"] == "boom"
    # error, the used description, AND otel.status_code are all consumed
    assert r["attrs_rest_csv"] == ""
    # bool-false error tag stays an attribute and decides nothing
    r2 = _run(spark, "error=false")
    assert not r2["otlp_status_set"] and r2["attrs_rest_csv"] == "error=false"


def test_error_message_falls_back_to_http_status_msg(spark):
    r = _run(spark, "error=true,http.status_message=oops")
    assert r["otlp_status_code"] == "error" and r["otlp_status_message"] == "oops"
    # http.status_message is never consumed
    assert r["attrs_rest_csv"] == "http.status_message=oops"


def test_otel_status_code_casing_and_unset(spark):
    assert _run(spark, "otel.status_code=Ok")["otlp_status_code"] == "ok"
    assert _run(spark, "otel.status_code=ERROR")["otlp_status_code"] == "error"
    r = _run(spark, "otel.status_code=bogus")
    assert r["otlp_status_set"] and r["otlp_status_code"] == "unset"
    # description consumed in this branch too
    r2 = _run(spark, "otel.status_code=OK,otel.status_description=fine")
    assert r2["otlp_status_message"] == "fine" and r2["attrs_rest_csv"] == ""


def test_http_code_fallback_kind_rules(spark):
    # 4xx: client -> error, server -> unset (status NOT set)
    r = _run(spark, "http.status_code=404,span.kind=client")
    assert r["otlp_status_set"] and r["otlp_status_code"] == "error"
    r2 = _run(spark, "http.status_code=404,span.kind=server")
    assert not r2["otlp_status_set"] and r2["otlp_status_code"] == "unset"
    # generic rule: >=100 && <399 unset, else error (399 is the quirk)
    assert not _run(spark, "http.status_code=200")["otlp_status_set"]
    assert _run(spark, "http.status_code=399")["otlp_status_code"] == "error"
    assert _run(spark, "http.status_code=500")["otlp_status_code"] == "error"
    # v1.40 key works; message picked up but key kept
    r3 = _run(spark, "http.response.status_code=503,http.status_message=bad")
    assert r3["otlp_status_code"] == "error" and r3["otlp_status_message"] == "bad"
    # unparseable code -> no status, tag kept
    r4 = _run(spark, "http.status_code=abc")
    assert not r4["otlp_status_set"] and "http.status_code=abc" in r4["attrs_rest_csv"]


def test_tracestate_extraction(spark):
    # '='-free tracestate value: the CSV map split is first-'='-only per
    # pair, so the fixtures keep label values flat like the wire decoders
    r = _run(spark, "a=1,w3c.tracestate=vendor:1")
    assert r["otlp_trace_state"] == "vendor:1" and r["attrs_rest_csv"] == "a=1"


# --- zipkin v2 conventions (to_translator.go:245-282,623-631) ----------------

from opentelemetry_collector_contrib_spark.operators.spans import zipkin_tags_to_otlp


def _zrun(spark, kind, tags_csv):
    df = spark.createDataFrame([(1, kind, tags_csv)], "i int, zk_kind string, zk_tags_csv string")
    return zipkin_tags_to_otlp(df).collect()[0]


def test_zipkin_wire_kind_wins_over_tag(spark):
    r = _zrun(spark, "CLIENT", "span.kind=internal")
    assert r["otlp_kind"] == "client"
    # the tag is NOT consumed when the wire kind decided
    assert r["attrs_rest_csv"] == "span.kind=internal"
    r2 = _zrun(spark, None, "span.kind=internal,a=1")
    assert r2["otlp_kind"] == "internal" and r2["attrs_rest_csv"] == "a=1"
    # default-branch span.kind tag consumed even when unrecognized
    r3 = _zrun(spark, None, "span.kind=weird,a=1")
    assert r3["otlp_kind"] == "unspecified" and r3["attrs_rest_csv"] == "a=1"


def test_zipkin_status_code_both_generations_and_zero_value(spark):
    assert _zrun(spark, None, "otel.status_code=STATUS_CODE_OK")["otlp_status_code"] == "ok"
    assert _zrun(spark, None, "otel.status_code=Error")["otlp_status_code"] == "error"
    r = _zrun(spark, None, "otel.status_code=bogus")
    assert r["otlp_status_set"] and r["otlp_status_code"] == "unset"  # Go map zero value
    r2 = _zrun(spark, None, "otel.status_code=Ok,otel.status_description=fine")
    assert r2["otlp_status_message"] == "fine" and r2["attrs_rest_csv"] == ""
    # description without the code tag stays an attribute, no message
    r3 = _zrun(spark, None, "otel.status_description=orphan")
    assert not r3["otlp_status_set"] and r3["otlp_status_message"] == ""
    assert r3["attrs_rest_csv"] == "otel.status_description=orphan"


def test_zipkin_error_tag_presence_semantics(spark):
    # ANY error value sets code=error; only 'true' is consumed
    r = _zrun(spark, None, "error=true")
    assert r["otlp_status_code"] == "error" and r["attrs_rest_csv"] == ""
    r2 = _zrun(spark, None, "error=false")
    assert r2["otlp_status_code"] == "error" and r2["attrs_rest_csv"] == "error=false"
    # error overrides otel.status_code=Ok
    r3 = _zrun(spark, None, "error=oops,otel.status_code=Ok")
    assert r3["otlp_status_code"] == "error" and r3["attrs_rest_csv"] == "error=oops"


def test_duplicate_tag_keys_last_wins_not_crash(spark):
    # Jaeger tags are a repeated list: duplicate keys are legal on the
    # wire and the reference's sequential PutStr gives last-wins —
    # str_to_map would throw under mapKeyDedupPolicy=EXCEPTION instead
    r = _run(spark, "error=false,error=true,a=1")
    assert r["otlp_status_code"] == "error" and r["attrs_rest_csv"] == "a=1"
    rz = _zrun(spark, None, "otel.status_code=Error,otel.status_code=Ok")
    assert rz["otlp_status_code"] == "ok"
