"""Grok dialect tests mirroring the reference's table
(pkg/ottl/ottlfuncs/func_extract_grok_patterns_test.go) plus portability
and adversarial-input checks for the bank operator."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.grok import (
    GROK_PATTERNS,
    GrokError,
    compile_grok,
    grok_parser,
    grok_parser_vectorized,
)


# --- pure compiler tests (no Spark) ----------------------------------------

def _match(pattern, text, **kw):
    cg = compile_grok(pattern, **kw)
    m = re.search(cg.regex, text)
    if m is None:
        return None
    return {f: m.group(i) for f, i, _ in cg.fields}


def test_raw_regex_named_captures():
    # func_extract_grok_patterns_test.go:27 "regex - extract patterns"
    assert _match(r"^a=(?P<a>\w+)\s+c=(?P<c>\w+)$", "a=b c=d") == {"a": "b", "c": "d"}


def test_no_pattern_found_yields_none():
    # test.go:38 "regex - no pattern found"
    assert _match(r"^a=(?P<a>\w+)$", "b=c") is None


def test_uri_default_pattern_needs_flag():
    # test.go:45 — %{URI} with namedCapturesOnly has no captures → error
    with pytest.raises(GrokError):
        compile_grok("%{URI}")
    got = _match("%{URI}", "see http://user:pw@host.example.com:8080/p?q=1 ok",
                 named_captures_only=False)
    assert got["URI"] == "http://user:pw@host.example.com:8080/p?q=1"


def test_custom_pattern_definitions():
    # test.go:90 "grok - custom patterns"
    got = _match(
        "%{MYPATTERN:m}",
        "input foo-123 rest",
        definitions=["MYPATTERN=foo-%{NONNEGINT}"],
    )
    assert got == {"m": "foo-123"}


def test_definition_format_errors():
    # test.go:150-178 error table
    with pytest.raises(GrokError, match="incorrect format"):
        compile_grok("%{X:a}", definitions=["NOEQUALSSIGN"])
    with pytest.raises(GrokError, match="should not contain"):
        compile_grok("%{X:a}", definitions=["A:B=x"])
    with pytest.raises(GrokError, match="named capture"):
        compile_grok("(.*)")  # test.go:161 "no named capture group"
    with pytest.raises(GrokError, match="unknown grok pattern"):
        compile_grok("%{NOT_A_REAL_PATTERN:x}")


def test_typed_captures():
    cg = compile_grok("%{NUMBER:f:float} %{INT:i:int} %{WORD:b:bool}")
    assert [(f, t) for f, _, t in cg.fields] == [
        ("f", "double"), ("i", "bigint"), ("b", "boolean")]
    with pytest.raises(GrokError, match="unsupported grok capture type"):
        compile_grok("%{INT:x:complex}")


def test_combined_apache_log():
    line = (
        '203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://www.example.com/start.html" "Mozilla/4.08"'
    )
    got = _match("%{COMBINEDAPACHELOG}", line)
    assert got["clientip"] == "203.0.113.9"
    assert got["auth"] == "frank"
    assert got["verb"] == "GET"
    assert got["request"] == "/apache_pb.gif"
    assert got["response"] == "200"
    assert got["bytes"] == "2326"
    assert got["agent"] == '"Mozilla/4.08"'


def test_character_class_parens_not_counted():
    cg = compile_grok(r"[(%][)]%{INT:i:int}")
    m = re.search(cg.regex, "()42")
    assert m.group(cg.fields[0][1]) == "42"


def test_anonymous_group_keeps_index_but_no_field():
    cg = compile_grok(r"(x+) %{WORD:w}")
    assert cg.fields == (("w", 2, "string"),)


def test_duplicate_capture_name_coalesces_first_wins():
    # alternation-union patterns (e.g. %{HTTPD_ERRORLOG}) legally name the
    # same field in every branch; the scalar contract is first
    # participating group wins (Go 1.22 regexp accepts the same shape)
    cg = compile_grok(r"%{WORD:a} %{INT:a}")
    assert [f for f, _, _ in cg.fields] == ["a", "a"]


def test_duplicate_capture_name_conflicting_types_rejected():
    with pytest.raises(GrokError, match="conflicting types"):
        compile_grok(r"%{WORD:a} %{INT:a:int}")


def test_recursion_cycle_detected():
    with pytest.raises(GrokError, match="recursion"):
        compile_grok("%{A:x}", definitions=["A=%{B}", "B=%{A}"])


def test_library_patterns_all_compile_portably():
    """Every library pattern must compile under Python re when expanded —
    the same string is fed verbatim to Java regex and RE2."""
    for name in GROK_PATTERNS:
        cg = compile_grok("%{" + name + ":x}")
        re.compile(cg.regex)


# --- Spark paths -----------------------------------------------------------

PAT = (
    r"%{TIMESTAMP_ISO8601:ts} \[%{LOGLEVEL:lvl}\] %{IPORHOST:host} "
    r"%{WORD:verb} latency=%{INT:latency:int}"
)

ROWS = [
    ("r1", "2024-01-02T03:04:05Z [warn] web-1.example.com GET latency=42"),
    ("r2", "no match here"),
    ("r3", "prefix 2024-02-03 11:22:33 [ERROR] 10.0.0.255 POST latency=7 suffix"),
    ("r4", "sep\x01byte 2024-06-07T08:09:10Z [debug] h.example.org PUT latency=123"),
    ("r5", None),
]


@pytest.fixture(scope="module")
def grok_df(spark):
    return spark.createDataFrame(ROWS, "id string, line string")


def test_native_path(spark, grok_df):
    got = {
        r["id"]: (r["ts"], r["lvl"], r["host"], r["verb"], r["latency"])
        for r in grok_parser(grok_df, "line", PAT).collect()
    }
    assert got["r1"] == ("2024-01-02T03:04:05Z", "warn", "web-1.example.com", "GET", 42)
    assert got["r2"] == (None,) * 5
    assert got["r3"] == ("2024-02-03 11:22:33", "ERROR", "10.0.0.255", "POST", 7)
    # adversarial \x01 payload takes the per-group fallback, fields unshifted
    assert got["r4"] == ("2024-06-07T08:09:10Z", "debug", "h.example.org", "PUT", 123)
    assert got["r5"] == (None,) * 5


def test_vectorized_matches_native(spark, grok_df):
    cols = ["id", "ts", "lvl", "host", "verb", "latency"]
    n = sorted(tuple(r) for r in grok_parser(grok_df, "line", PAT).select(cols).collect())
    v = sorted(
        tuple(r) for r in grok_parser_vectorized(grok_df, "line", PAT).select(cols).collect()
    )
    assert n == v


def test_ottl_function_form(spark, grok_df):
    from opentelemetry_collector_contrib_spark.functions.ottl import call

    out = grok_df.select(
        "id", call("ExtractGrokPatterns", F.col("line"), PAT).alias("g")
    ).collect()
    by_id = {r["id"]: r["g"] for r in out}
    assert by_id["r1"]["lvl"] == "warn" and by_id["r1"]["latency"] == 42
    assert by_id["r2"]["host"] is None


def test_typed_capture_bad_values_null_not_abort(spark):
    """A capture that doesn't parse as its declared type is a per-record
    NULL (reference errors per-record) — never an ANSI-mode job abort —
    and the native and vectorized paths agree on the coercion matrix."""
    rows = [
        (1, "v=42"), (2, "v=42.5"), (3, "v=hello"),
        (4, "v=99999999999999999999"), (5, "v=-7"),
    ]
    df = spark.createDataFrame(rows, "id int, line string")
    pat = "v=%{NOTSPACE:x:int}"
    nat = {r["id"]: r["x"] for r in grok_parser(df, "line", pat).collect()}
    vec = {r["id"]: r["x"] for r in grok_parser_vectorized(df, "line", pat).collect()}
    expect = {1: 42, 2: None, 3: None, 4: None, 5: -7}
    assert nat == expect and vec == expect

    bpat = "v=%{NOTSPACE:b:bool}"
    brows = [(1, "v=true"), (2, "v=yes"), (3, "v=0"), (4, "v=maybe"), (5, "v=T")]
    bdf = spark.createDataFrame(brows, "id int, line string")
    bn = {r["id"]: r["b"] for r in grok_parser(bdf, "line", bpat).collect()}
    bv = {r["id"]: r["b"] for r in grok_parser_vectorized(bdf, "line", bpat).collect()}
    bexpect = {1: True, 2: True, 3: False, 4: None, 5: True}
    assert bn == bexpect and bv == bexpect

    fpat = "v=%{NOTSPACE:f:float}"
    frows = [(1, "v=1.5"), (2, "v=1e3"), (3, "v=zzz")]
    fdf = spark.createDataFrame(frows, "id int, line string")
    fn = {r["id"]: r["f"] for r in grok_parser(fdf, "line", fpat).collect()}
    fv = {r["id"]: r["f"] for r in grok_parser_vectorized(fdf, "line", fpat).collect()}
    fexpect = {1: 1.5, 2: 1000.0, 3: None}
    assert fn == fexpect and fv == fexpect


def test_base_library_extension_names_compile_and_match():
    """The remainder of the legacy grok-patterns base set: every name
    compiles through the translator and matches a canonical sample."""
    import re as _re

    from opentelemetry_collector_contrib_spark.operators.grok import (
        GROK_PATTERNS,
        compile_grok,
    )

    samples = {
        "BASE16FLOAT": "0x1A.f3",
        "MONTHNUM2": "09",
        "ISO8601_SECOND": "59",
        "HOST": "api.example.com",
        "MAC": "001B.6300.1234",
        "CISCOMAC": "001B.6300.1234",
        "WINDOWSMAC": "00-1B-63-00-12-34",
        "TTY": "/dev/pts/3",
        "URN": "urn:ietf:rfc:2648",
        "SYSLOGFACILITY": "<13.5>",
        "HTTPDUSER": "alice@example.com",
        "HTTPDERROR_DATE": "Mon Oct 12 08:15:23 2023",
        "DATESTAMP_RFC822": "Mon Oct 12 2023 08:15:23 UTC",
        "DATESTAMP_RFC2822": "Mon, 12 Oct 2023 08:15:23 +00:00",
        "DATESTAMP_OTHER": "Mon Oct 12 08:15:23 UTC 2023",
        "DATESTAMP_EVENTLOG": "20231012081523",
        "HTTPD_COMMONLOG": '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326',
        "HTTPD_COMBINEDLOG": (
            '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326'
            ' "http://ref" "UA/1.0"'
        ),
    }
    assert set(samples) <= set(GROK_PATTERNS)
    for name, sample in samples.items():
        # named_captures_only=True: bare refs expand non-capturing, so
        # composite patterns with repeated sub-patterns (TIME inside
        # RFC2822, USER twice in the apache line) stay duplicate-free
        cg = compile_grok(f"^%{{{name}:f}}$", named_captures_only=True)
        assert _re.match(cg.regex, sample), f"{name} failed on {sample!r}"


def test_urn_percent_encoded_chars_match():
    import re as _re

    from opentelemetry_collector_contrib_spark.operators.grok import compile_grok

    cg = compile_grok("^%{URN:u}$", named_captures_only=True)
    assert _re.match(cg.regex, "urn:example:a%3Fb")


# --- round-4 library completion: full default-set names -----------------------

_R4_SAMPLES = {
    "BOOLEAN": "true",
    "SYSLOGBASE": "Oct 11 22:14:15 mymachine su[230]:",
    "SYSLOGBASE2": "Oct 11 22:14:15 mymachine su[230]:",
    "SYSLOGLINE": "Oct 11 22:14:15 mymachine su[230]: session opened",
    "SYSLOGPAMSESSION": (
        "Oct 11 22:14:15 host sshd[123]: pam_unix(sshd:session): "
        "session opened for user alice by (uid=0)"
    ),
    "CRONLOG": "Oct 11 22:14:15 host CRON[111]: (root) CMD (run-parts /etc/cron.hourly)",
    "SYSLOG5424LINE": (
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog 1234 ID47 '
        '[exampleSDID@32473 iut="3"] BOMAn application event log entry'
    ),
    "HTTPD20_ERRORLOG": "[Mon Oct 11 22:14:15 2023] [error] [client 1.2.3.4] File does not exist",
    "HTTPD24_ERRORLOG": (
        "[Mon Oct 11 22:14:15 2023] [core:error] [pid 1234:tid 5678]"
        " [client 1.2.3.4:5678] AH00124: Request exceeded limits"
    ),
    "JAVACLASS": "com.example.Foo$Bar",
    "JAVASTACKTRACEPART": "    at com.example.Foo.run(Foo.java:42)",
    "CATALINA_DATESTAMP": "Oct 11, 2023 10:14:15 PM",
    "CATALINALOG": "Oct 11, 2023 10:14:15 PM org.apache.Bootstrap started in 1234 ms",
    "TOMCAT_DATESTAMP": "2023-10-11 22:14:15,003",
    "TOMCATLOG": "2023-10-11 22:14:15,003 | ERROR | com.example.Foo - boom",
}


def test_round4_pattern_names_compile_and_match():
    import re as _re

    assert set(_R4_SAMPLES) <= set(GROK_PATTERNS)
    for name, sample in _R4_SAMPLES.items():
        cg = compile_grok(f"%{{{name}:f}}", named_captures_only=True)
        assert _re.search(cg.regex, sample), f"{name} failed on {sample!r}"


def test_httpd_errorlog_union_coalesces_both_branches(spark):
    """%{HTTPD_ERRORLOG} names timestamp/loglevel/message in BOTH the 2.0
    and 2.4 branches — whichever branch matched must populate the field,
    on the native and the vectorized path identically."""
    from opentelemetry_collector_contrib_spark.operators.grok import (
        grok_parser,
        grok_parser_vectorized,
    )

    rows = [
        ("[Mon Oct 11 22:14:15 2023] [error] [client 1.2.3.4] old style",),
        ("[Mon Oct 11 22:14:15 2023] [core:error] [pid 12:tid 34] new style",),
    ]
    df = spark.createDataFrame(rows, "line string")
    pat = "%{HTTPD_ERRORLOG}"
    want = [
        ("error", "old style"),
        ("error", "new style"),
    ]
    for impl in (grok_parser, grok_parser_vectorized):
        out = impl(df, "line", pat).select("loglevel", "message").collect()
        assert [(r["loglevel"], r["message"]) for r in out] == want, impl.__name__


def test_default_set_name_coverage():
    """≥95% of the public default pattern-set names resolve (the
    done-criterion for the library completion)."""
    default_names = [
        # legacy base file
        "USERNAME", "USER", "EMAILLOCALPART", "EMAILADDRESS", "INT",
        "BASE10NUM", "NUMBER", "BASE16NUM", "BASE16FLOAT", "POSINT",
        "NONNEGINT", "WORD", "NOTSPACE", "SPACE", "DATA", "GREEDYDATA",
        "QUOTEDSTRING", "QS", "UUID", "URN", "MAC", "CISCOMAC",
        "WINDOWSMAC", "COMMONMAC", "IPV6", "IPV4", "IP", "HOSTNAME",
        "HOST", "IPORHOST", "HOSTPORT", "PATH", "UNIXPATH", "TTY",
        "WINPATH", "URIPROTO", "URIHOST", "URIPATH", "URIPARAM",
        "URIPATHPARAM", "URI", "MONTH", "MONTHNUM", "MONTHNUM2",
        "MONTHDAY", "DAY", "YEAR", "HOUR", "MINUTE", "SECOND", "TIME",
        "DATE_US", "DATE_EU", "ISO8601_TIMEZONE", "ISO8601_SECOND",
        "TIMESTAMP_ISO8601", "DATE", "DATESTAMP", "TZ",
        "DATESTAMP_RFC822", "DATESTAMP_RFC2822", "DATESTAMP_OTHER",
        "DATESTAMP_EVENTLOG", "SYSLOGTIMESTAMP", "PROG", "SYSLOGPROG",
        "SYSLOGHOST", "SYSLOGFACILITY", "HTTPDATE", "LOGLEVEL",
        "SYSLOGBASE", "COMMONAPACHELOG", "COMBINEDAPACHELOG",
        "HTTPDUSER", "HTTPDERROR_DATE", "HTTPD_COMMONLOG",
        "HTTPD_COMBINEDLOG", "HTTPD20_ERRORLOG", "HTTPD24_ERRORLOG",
        "HTTPD_ERRORLOG", "BOOLEAN",
        # linux-syslog companion set
        "SYSLOG5424PRINTASCII", "SYSLOGBASE2", "SYSLOGPAMSESSION",
        "CRON_ACTION", "CRONLOG", "SYSLOGLINE", "SYSLOG5424PRI",
        "SYSLOG5424SD", "SYSLOG5424BASE", "SYSLOG5424LINE",
        # java companion set
        "JAVACLASS", "JAVAFILE", "JAVAMETHOD", "JAVATHREAD",
        "JAVALOGMESSAGE", "JAVASTACKTRACEPART", "CATALINA_DATESTAMP",
        "CATALINALOG", "TOMCAT_DATESTAMP", "TOMCATLOG",
    ]
    have = [n for n in default_names if n in GROK_PATTERNS]
    assert len(have) / len(default_names) >= 0.95, sorted(
        set(default_names) - set(GROK_PATTERNS)
    )


def test_round4_patterns_through_both_spark_paths(spark):
    """Each new library pattern extracts identically on the native
    (one-regex Catalyst) and vectorized (mapInPandas) paths over a real
    DataFrame — not just compiler-level matching."""
    rows = [(name, sample) for name, sample in _R4_SAMPLES.items()]
    df = spark.createDataFrame(rows, "pat_name string, raw string")
    for name in ("SYSLOGLINE", "SYSLOG5424LINE", "HTTPD24_ERRORLOG",
                 "JAVASTACKTRACEPART", "TOMCATLOG", "CRONLOG"):
        pat = f"%{{{name}}}"
        sub = df.filter(F.col("pat_name") == name)
        n = grok_parser(sub, "raw", pat, named_captures_only=False).collect()
        v = grok_parser_vectorized(sub, "raw", pat, named_captures_only=False).collect()
        nd = {k: x for k, x in n[0].asDict().items() if k not in ("pat_name", "raw")}
        vd = {k: x for k, x in v[0].asDict().items() if k not in ("pat_name", "raw")}
        assert nd == vd, (name, nd, vd)
        assert any(x is not None for x in nd.values()), name


def test_capture_collision_with_input_column_raises(spark):
    df = spark.createDataFrame([("x=1",)], "line string")
    with pytest.raises(GrokError, match="collide with input columns"):
        grok_parser(df, "line", "x=%{INT:line}")
    with pytest.raises(GrokError, match="collide with input columns"):
        grok_parser_vectorized(df, "line", "x=%{INT:line}")
