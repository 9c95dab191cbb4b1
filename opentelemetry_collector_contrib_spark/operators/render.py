"""Exporter-side wire-format RENDERING — the outbound mirror of the
wire-format parsers in ``operators/parse.py``.

The reference ships dozens of exporters whose essence (once the HTTP/TCP
client plumbing is stripped away) is "serialize each record into a
vendor line/JSON shape":

- syslogexporter: RFC5424 / RFC3164 lines with attribute-driven fields
  and '-' defaults (``exporter/syslogexporter/rfc5424_formatter.go:26-44``,
  ``rfc3164_formatter.go:19-31``, constants ``sender.go:19-41``)
- prometheusexporter / prometheusremotewriteexporter: the text exposition
  sample line ``name{labels} value ts_ms``
- elasticsearchexporter: ``_bulk`` NDJSON — an action metadata line per
  document (``bulkindexer.go:47,217-229``: index + docID + action)
- splunkhecexporter: HEC event JSON objects
  (``{"time","host","source","sourcetype","index","event","fields"}``)

Network delivery is out of scope in this sandbox (same stance as the
kafka exporter contract); rendering IS in scope, because at 100 TB the
serialization is the compute-heavy half — it must be a pure codegen
projection, one pass, no UDFs. Everything here is built from `concat`/
`regexp_replace`/`date_format` so whole-stage codegen keeps the render
inside the scan-project pipeline.

Float policy: value columns are taken as ALREADY-RENDERED string columns.
Engine-portable float→string is the caller's contract (this repo renders
via decimal casts — see the registry queries); baking one float format in
here would silently break cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# sender.go:19-41 — attribute keys and defaults
DEFAULT_PRIORITY = 165
VERSION_RFC5424 = 1
NIL_VALUE = "-"


def _col(c: Column | str | None, default: str | None = None) -> Column:
    if c is None:
        return F.lit(default).cast("string")
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.cast("string"), F.lit(default)) if default is not None else col


def json_escape(col: Column) -> Column:
    r"""Minimal JSON string escaping as a codegen-friendly replace chain:
    backslash first, then quote, then the control trio \n \r \t. Identical
    semantics are expressible in any SQL engine (the oracle mirrors the
    same chain), unlike `to_json`, whose number/unicode formatting is
    engine-specific."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def _rfc3339_micro(ts: Column) -> Column:
    """Go's RFC3339MICRO (`2006-01-02T15:04:05.999999Z07:00`, used by
    rfc5424_formatter.go:55): microsecond fraction with trailing zeros
    trimmed, the whole fraction dropped when zero, UTC rendered as 'Z'
    (pdata timestamps are UTC nanos)."""
    full = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    return F.regexp_replace(full, r"\.?0+Z$", "Z")


def render_syslog_rfc5424(
    df: DataFrame,
    ts: Column | str = "ts",
    priority: Column | str | None = None,
    version: Column | str | None = None,
    hostname: Column | str | None = None,
    appname: Column | str | None = None,
    proc_id: Column | str | None = None,
    msg_id: Column | str | None = None,
    structured_data: Column | str | None = None,
    message: Column | str | None = None,
    octet_counting: bool = False,
    out: str = "syslog_line",
) -> DataFrame:
    """RFC5424 line per record, mirroring rfc5424_formatter.go:26-44:
    `<pri>ver ts host app pid msgid sd[ msg]\\n` — every field falls back
    to its sender.go default ('-' / 165 / 1), the message gets a leading
    space only when non-empty (formatMessage, :102-108), and
    `octet_counting` prepends the BYTE length RFC6587-style (:38-41).
    `structured_data` is taken as a pre-rendered string column: the
    reference renders its SD map by ranging over a Go map, which is
    deliberately unordered — a deterministic engine cannot (and should
    not) reproduce nondeterministic output, so ordering is the caller's
    contract here."""
    tcol = F.col(ts) if isinstance(ts, str) else ts
    msg = _col(message, "")
    line = F.concat(
        F.lit("<"),
        _col(priority, str(DEFAULT_PRIORITY)),
        F.lit(">"),
        _col(version, str(VERSION_RFC5424)),
        F.lit(" "),
        _rfc3339_micro(tcol),
        F.lit(" "),
        _col(hostname, NIL_VALUE),
        F.lit(" "),
        _col(appname, NIL_VALUE),
        F.lit(" "),
        _col(proc_id, NIL_VALUE),
        F.lit(" "),
        _col(msg_id, NIL_VALUE),
        F.lit(" "),
        _col(structured_data, NIL_VALUE),
        F.when(msg != "", F.concat(F.lit(" "), msg)).otherwise(F.lit("")),
        F.lit("\n"),
    )
    if octet_counting:
        line = F.concat(F.octet_length(line).cast("string"), F.lit(" "), line)
    return df.withColumn(out, line)


def render_syslog_rfc3164(
    df: DataFrame,
    ts: Column | str = "ts",
    priority: Column | str | None = None,
    hostname: Column | str | None = None,
    appname: Column | str | None = None,
    message: Column | str | None = None,
    out: str = "syslog_line",
) -> DataFrame:
    """BSD syslog line per rfc3164_formatter.go:19-31:
    `<pri>Mmm _d HH:MM:SS host[ app:][ msg]\\n` — the `Jan _2` timestamp is
    space-padded to width 2, the appname gets a ':' suffix only when
    present (:45-50), and the app↔message delimiter space appears only
    when both are non-empty (:25-28)."""
    tcol = F.col(ts) if isinstance(ts, str) else ts
    stamp = F.concat(
        F.date_format(tcol, "MMM"),
        F.lit(" "),
        F.lpad(F.dayofmonth(tcol).cast("string"), 2, " "),
        F.lit(" "),
        F.date_format(tcol, "HH:mm:ss"),
    )
    app = _col(appname, "")
    app_part = F.when(app != "", F.concat(app, F.lit(":"))).otherwise(F.lit(""))
    msg = _col(message, "")
    delim = F.when((app != "") & (msg != ""), F.lit(" ")).otherwise(F.lit(""))
    line = F.concat(
        F.lit("<"),
        _col(priority, str(DEFAULT_PRIORITY)),
        F.lit(">"),
        stamp,
        F.lit(" "),
        _col(hostname, NIL_VALUE),
        F.lit(" "),
        app_part,
        delim,
        msg,
        F.lit("\n"),
    )
    return df.withColumn(out, line)


def render_prometheus_text(
    df: DataFrame,
    name: Column | str,
    labels_csv: Column | str | None,
    value_str: Column | str,
    ts_ms: Column | str | None = None,
    out: str = "prom_line",
) -> DataFrame:
    """Prometheus text exposition sample line (`name{k="v",...} value
    [ts_ms]`) — the prometheusexporter's scrape-page payload, and the
    exact inverse of ``parse.parse_prometheus_text``. `labels_csv` is the
    repo's canonical sorted `k=v,...` CSV; each pair is rewritten to
    `k="v"` in place (so label ordering matches the parser round-trip)."""
    ncol = F.col(name) if isinstance(name, str) else name
    vcol = F.col(value_str) if isinstance(value_str, str) else value_str
    if labels_csv is not None:
        lcol = F.col(labels_csv) if isinstance(labels_csv, str) else labels_csv
        # one global regexp_replace (keys cannot contain '=' or ',' in the
        # canonical CSV, values cannot contain ','), NOT a transform() HOF —
        # HOFs evict the projection from whole-stage codegen
        pairs = F.regexp_replace(lcol, r"([^=,]+)=([^,]*)", '$1="$2"')
        braces = F.when(
            lcol.isNotNull() & (lcol != ""),
            F.concat(F.lit("{"), pairs, F.lit("}")),
        ).otherwise(F.lit(""))
    else:
        braces = F.lit("")
    line = F.concat(ncol, braces, F.lit(" "), vcol)
    if ts_ms is not None:
        mcol = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
        line = F.concat(line, F.lit(" "), mcol.cast("string"))
    return df.withColumn(out, line)


def render_es_bulk(
    df: DataFrame,
    index: Column | str,
    doc_id: Column | str,
    doc_fields: dict[str, tuple[Column | str, bool]],
    action: str = "create",
    out_action: str = "es_action",
    out_doc: str = "es_doc",
) -> DataFrame:
    """Elasticsearch `_bulk` NDJSON pair per record — the action metadata
    line (`{"create":{"_index":...,"_id":...}}`) and the document line —
    matching what elasticsearchexporter hands its bulk indexer per doc
    (``bulkindexer.go:47`` Add(index, docID, document, action);
    ``:217-229``). `doc_fields` maps JSON key -> (column, quoted?): quoted
    values go through ``json_escape``; unquoted ones (numbers/booleans)
    are emitted verbatim and must already be engine-portable strings.
    NULL field values render as JSON null. Key order = dict order, so the
    oracle can mirror it."""
    icol = _col(index)
    idcol = _col(doc_id)
    act = F.concat(
        F.lit('{"' + action + '":{"_index":"'),
        json_escape(icol.cast("string")),
        F.lit('","_id":"'),
        json_escape(idcol.cast("string")),
        F.lit('"}}'),
    )
    parts: list[Column] = []
    for i, (key, (col, quoted)) in enumerate(doc_fields.items()):
        c = (F.col(col) if isinstance(col, str) else col).cast("string")
        rendered = (
            F.concat(F.lit('"'), json_escape(c), F.lit('"')) if quoted else c
        )
        parts.append(
            F.concat(
                F.lit(("," if i else "") + '"' + key + '":'),
                F.coalesce(rendered, F.lit("null")),
            )
        )
    doc = F.concat(F.lit("{"), *parts, F.lit("}"))
    return df.withColumn(out_action, act).withColumn(out_doc, doc)


def render_splunk_hec(
    df: DataFrame,
    ts: Column | str = "ts",
    host: Column | str | None = None,
    source: Column | str | None = None,
    sourcetype: Column | str | None = None,
    index: Column | str | None = None,
    event: Column | str | None = None,
    out: str = "hec_event",
) -> DataFrame:
    """Splunk HEC event JSON per record (splunkhecexporter's wire shape:
    `{"time":<epoch.millis>,"host":...,"source":...,"sourcetype":...,
    "index":...,"event":...}`). `time` is epoch seconds with exactly 3
    decimals (HEC's documented millisecond resolution) assembled from
    integer division/modulo so every engine prints the same digits. Optional fields
    are omitted when their column is NULL — same as the exporter leaving
    unset config keys out of the payload."""
    tcol = F.col(ts) if isinstance(ts, str) else ts
    # integer-only epoch.millis assembly: floor(us/1e6) + zero-padded
    # truncated milliseconds — no float or decimal division anywhere, so
    # every engine prints identical digits
    us = F.unix_micros(tcol.cast("timestamp"))
    secs = F.floor(us / F.lit(1000000)).cast("bigint")
    ms = F.floor(F.pmod(us, F.lit(1000000)) / F.lit(1000)).cast("bigint")
    time_str = F.concat(secs.cast("string"), F.lit("."), F.lpad(ms.cast("string"), 3, "0"))
    obj = F.concat(F.lit('{"time":'), time_str)
    for key, col in (("host", host), ("source", source), ("sourcetype", sourcetype), ("index", index)):
        if col is None:
            continue
        c = (F.col(col) if isinstance(col, str) else col).cast("string")
        obj = F.concat(
            obj,
            F.when(
                c.isNotNull(), F.concat(F.lit(',"' + key + '":"'), json_escape(c), F.lit('"'))
            ).otherwise(F.lit("")),
        )
    if event is not None:
        e = (F.col(event) if isinstance(event, str) else event).cast("string")
        obj = F.concat(
            obj, F.lit(',"event":"'), F.coalesce(json_escape(e), F.lit("")), F.lit('"')
        )
    return df.withColumn(out, F.concat(obj, F.lit("}")))


def render_carbon(
    df: DataFrame,
    name: Column | str,
    value: Column,
    ts_s: Column,
    tags: list[tuple[str, Column]] | None = None,
    out: str = "body",
) -> DataFrame:
    """carbonexporter plaintext serialization (exporter/carbonexporter —
    the inverse of receiver/carbonreceiver's plaintext parser):
    `<name>[;k=v...] <value> <unix_seconds>`, one line per datapoint.
    Caller guarantees tag keys avoid `;!^=` and values avoid `;~`
    (the receiver rejects them). Pure projection."""
    path = _col(name)
    for k, v in tags or []:
        path = F.concat(path, F.lit(f";{k}="), v.cast("string"))
    line = F.concat_ws(" ", path, value.cast("string"), ts_s.cast("string"))
    return df.withColumn(out, line)


def render_loki_push(
    df: DataFrame,
    labels: list[tuple[str, Column]],
    ts_ns: Column,
    line: Column,
    out: str = "body",
) -> DataFrame:
    """lokiexporter push-API JSON body (the receiver's wire format:
    `{"streams":[{"stream":{..labels..},"values":[["<ns>","<line>"]]}]}`),
    one single-value stream per row — a valid push payload per record, the
    shape a per-row exporter queue emits. Built with to_json over typed
    structs so label values and log lines are JSON-escaped exactly. The
    nanosecond timestamp rides as a DIGIT STRING (the API's format — no
    double round-trip). Pure projection."""
    stream = F.struct(*[v.cast("string").alias(k) for k, v in labels])
    payload = F.struct(
        F.array(
            F.struct(
                stream.alias("stream"),
                F.array(F.array(ts_ns.cast("string"), line.cast("string"))).alias("values"),
            )
        ).alias("streams")
    )
    return df.withColumn(out, F.to_json(payload))


def render_otlp_json_logs(
    df: DataFrame,
    body: Column,
    time_unix_nano: Column,
    severity_text: Column,
    severity_number: Column,
    resource_attrs: list[tuple[str, Column]] | None = None,
    log_attrs: list[tuple[str, Column]] | None = None,
    scope_name: Column | None = None,
    out: str = "payload",
) -> DataFrame:
    """OTLP/JSON LogsData marshaling (the fileexporter's otlp_json encoding
    / otlpjsonconnector's input format): one `{"resourceLogs":[...]}`
    envelope per record with the attribute list-of-{key,value:{stringValue}}
    shape. to_json guarantees escaping, so render∘parse is the identity on
    every field. Pure projection."""

    def kvlist(pairs):
        if not pairs:
            return F.array().cast(
                "array<struct<key:string,value:struct<stringValue:string>>>"
            )
        return F.array(
            *[
                F.struct(
                    F.lit(k).alias("key"),
                    F.struct(v.cast("string").alias("stringValue")).alias("value"),
                )
                for k, v in pairs
            ]
        )

    record = F.struct(
        time_unix_nano.cast("string").alias("timeUnixNano"),
        severity_text.cast("string").alias("severityText"),
        severity_number.cast("int").alias("severityNumber"),
        F.struct(body.cast("string").alias("stringValue")).alias("body"),
        kvlist(log_attrs).alias("attributes"),
    )
    payload = F.struct(
        F.array(
            F.struct(
                F.struct(kvlist(resource_attrs).alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(
                            (scope_name if scope_name is not None else F.lit("render")).alias("name")
                        ).alias("scope"),
                        F.array(record).alias("logRecords"),
                    )
                ).alias("scopeLogs"),
            )
        ).alias("resourceLogs")
    )
    return df.withColumn(out, F.to_json(payload))


def render_influx_line(
    df: DataFrame,
    measurement: Column | str,
    tags: list[tuple[str, Column]],
    fields: list[tuple[str, Column]],
    ts_ns: Column | None = None,
    out: str = "body",
) -> DataFrame:
    """influxdbexporter line-protocol serialization (exporter/
    influxdbexporter writes the same wire format receiver/influxdbreceiver
    accepts): `measurement[,tag=v...] field=v[,f2=v2] [ns]`. Tags render in
    the given order (the parser sorts on read, so round trips are
    order-insensitive); the ns timestamp rides as a digit string — never
    through a double. Caller guarantees token-safe tag values (no ',', '=',
    ' ' — the parse side's unescaped subset). Pure projection."""
    line = _col(measurement)
    for k, v in tags:
        line = F.concat(line, F.lit(f",{k}="), v.cast("string"))
    field_parts = [
        F.concat(F.lit(f"{k}=" if i == 0 else f",{k}="), v.cast("string"))
        for i, (k, v) in enumerate(fields)
    ]
    line = F.concat(line, F.lit(" "), *field_parts)
    if ts_ns is not None:
        line = F.concat(line, F.lit(" "), ts_ns.cast("long").cast("string"))
    return df.withColumn(out, line)


def render_zipkin_json(
    df: DataFrame,
    trace_id: Column,
    span_id: Column,
    parent_id: Column | None,
    name: Column,
    kind: Column,
    ts_us: Column,
    duration_us: Column,
    service_name: Column,
    tags: list[tuple[str, Column]] | None = None,
    out: str = "body",
) -> DataFrame:
    """zipkinexporter v2 JSON serialization (the zipkinreceiver wire format
    zipkin_json_spans parses): a one-span array per record. to_json handles
    all escaping; µs timestamps stay integral. Pure projection."""
    tag_map = (
        F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in tags]),
            F.array(*[v.cast("string") for _, v in tags]),
        )
        if tags
        else F.lit(None).cast("map<string,string>")
    )
    span = F.struct(
        trace_id.cast("string").alias("traceId"),
        span_id.cast("string").alias("id"),
        (parent_id.cast("string") if parent_id is not None else F.lit(None).cast("string")).alias(
            "parentId"
        ),
        name.cast("string").alias("name"),
        kind.cast("string").alias("kind"),
        ts_us.cast("long").alias("timestamp"),
        duration_us.cast("long").alias("duration"),
        F.struct(service_name.cast("string").alias("serviceName")).alias("localEndpoint"),
        tag_map.alias("tags"),
    )
    return df.withColumn(out, F.to_json(F.array(span)))


def render_emf(
    df: DataFrame,
    namespace: str,
    dimensions: list[tuple[str, Column]],
    metrics: list[tuple[str, str, Column]],
    ts_ms: Column,
    out: str = "body",
) -> DataFrame:
    """awsemfexporter EMF V1 structured-log serialization
    (exporter/awsemfexporter/metric_translator.go:415-434: `"Version":"1"`
    with the `_aws.CloudWatchMetrics` directive + `_aws.Timestamp` ms, the
    dimension values and metric values as top-level fields). `metrics` is
    [(name, unit, value_col)]; one dimension set containing every dimension
    key, matching the exporter's rolled-up default. Pure projection."""
    directive = F.struct(
        F.array(
            F.struct(
                F.lit(namespace).alias("Namespace"),
                F.array(F.array(*[F.lit(k) for k, _ in dimensions])).alias("Dimensions"),
                F.array(
                    *[
                        F.struct(F.lit(n).alias("Name"), F.lit(u).alias("Unit"))
                        for n, u, _ in metrics
                    ]
                ).alias("Metrics"),
            )
        ).alias("CloudWatchMetrics"),
        ts_ms.cast("long").alias("Timestamp"),
    )
    payload = F.struct(
        F.lit("1").alias("Version"),
        directive.alias("_aws"),
        *[v.cast("string").alias(k) for k, v in dimensions],
        *[v.cast("double").alias(n) for n, _, v in metrics],
    )
    return df.withColumn(out, F.to_json(payload))


def render_wavefront(
    df: DataFrame,
    name: Column | str,
    value: Column,
    ts_s: Column | None = None,
    tags: list[tuple[str, Column]] | None = None,
    out: str = "body",
) -> DataFrame:
    """Wavefront plaintext metric line serialization — the wire format
    receiver/wavefrontreceiver/wavefront_parser.go:56 accepts:
    `<name> <value> [<ts>] source=<src> [pointTags]`. The value column
    renders via cast-to-string (Java shortest-round-trip doubles, digit
    strings for longs — both inside the parser's go_num). Tags render in
    caller order with unquoted values (the parser's token-safe subset:
    no ' ', '"', leading-quote); ts is integer seconds. Pure projection."""
    line = _col(name)
    line = F.concat(line, F.lit(" "), value.cast("string"))
    if ts_s is not None:
        # NULL ts -> the optional slot is omitted for that row, not a NULL line
        with_ts = F.concat(line, F.lit(" "), ts_s.cast("long").cast("string"))
        line = F.when(ts_s.isNotNull(), with_ts).otherwise(line)
    for k, v in tags or []:
        line = F.concat(line, F.lit(f" {k}="), v.cast("string"))
    return df.withColumn(out, line)


def render_libhoney(
    df: DataFrame,
    time: Column,
    data: list[tuple[str, Column]],
    samplerate: Column | None = None,
    out: str = "body",
) -> DataFrame:
    """Libhoney batch-events JSON serialization (the body a honeycomb SDK
    POSTs to /1/batch/{dataset}, which receiver/libhoneyreceiver accepts):
    a one-event array per record. `time` is a pre-rendered string (RFC3339
    or epoch digits — the parse side's eventtime ladder accepts both);
    data values stringify (the parser reads raw-token maps, so numeric
    strings round-trip through try_cast). NULL data values drop from the
    map, mirroring a sender that omits absent fields."""
    entries = [
        (F.lit(k), v.cast("string")) for k, v in data
    ]
    m = F.map_filter(
        F.map_from_arrays(
            F.array(*[k for k, _ in entries]), F.array(*[v for _, v in entries])
        ),
        lambda _k, v: v.isNotNull(),
    )
    event = F.struct(
        time.cast("string").alias("time"),
        (samplerate if samplerate is not None else F.lit(1)).cast("int").alias("samplerate"),
        m.alias("data"),
    )
    return df.withColumn(out, F.to_json(F.array(event)))


def render_xray_segment(
    df: DataFrame,
    trace_id: Column,
    seg_id: Column,
    name: Column,
    start_s: Column,
    end_s: Column,
    parent_id: Column | None = None,
    origin: Column | None = None,
    error: Column | None = None,
    fault: Column | None = None,
    http_status: Column | None = None,
    annotations: list[tuple[str, Column]] | None = None,
    subsegment: Column | None = None,
    out: str = "body",
) -> DataFrame:
    """AWS X-Ray segment-document serialization (the JSON shape
    internal/aws/xray/tracesegment.go:27-60 unmarshals; what the
    awsxrayexporter's segment marshaller emits): trace_id in the
    `1-epochhex8-hex24` wire form, float-second timestamps, optional flag
    and http blocks, one optional pre-rendered subsegment struct column
    (built with xray_subsegment_struct). to_json drops NULL struct slots,
    matching the reference's omitempty tags."""
    ann = (
        F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k, _ in annotations]),
                F.array(*[v.cast("string") for _, v in annotations]),
            ),
            lambda _k, v: v.isNotNull(),
        )
        if annotations
        else None
    )
    fields = [
        trace_id.cast("string").alias("trace_id"),
        seg_id.cast("string").alias("id"),
        name.cast("string").alias("name"),
        start_s.cast("double").alias("start_time"),
        end_s.cast("double").alias("end_time"),
    ]
    if parent_id is not None:
        fields.append(parent_id.cast("string").alias("parent_id"))
    if origin is not None:
        fields.append(origin.cast("string").alias("origin"))
    if error is not None:
        fields.append(error.cast("boolean").alias("error"))
    if fault is not None:
        fields.append(fault.cast("boolean").alias("fault"))
    if http_status is not None:
        fields.append(
            F.struct(F.struct(http_status.cast("long").alias("status")).alias("response")).alias(
                "http"
            )
        )
    if ann is not None:
        fields.append(ann.alias("annotations"))
    if subsegment is not None:
        fields.append(F.when(subsegment.isNotNull(), F.array(subsegment)).alias("subsegments"))
    return df.withColumn(out, F.to_json(F.struct(*fields)))


def xray_subsegment_struct(
    seg_id: Column,
    name: Column,
    start_s: Column,
    end_s: Column,
    namespace: Column | None = None,
) -> Column:
    """A subsegment struct for render_xray_segment's `subsegment` slot."""
    fields = [
        seg_id.cast("string").alias("id"),
        name.cast("string").alias("name"),
        start_s.cast("double").alias("start_time"),
        end_s.cast("double").alias("end_time"),
    ]
    if namespace is not None:
        fields.append(namespace.cast("string").alias("namespace"))
    return F.struct(*fields)


def _am_sanitize(name: str) -> str:
    """alertmanager_exporter.go:57-70 sanitizeLabelName: [a-zA-Z_] keep,
    digits keep except a leading digit gains a '_' prefix, everything
    else becomes '_'. Keys are static config strings, so this runs once
    in Python, not per row."""
    out = []
    for i, ch in enumerate(name):
        if ch.isascii() and (ch.isalpha() or ch == "_"):
            out.append(ch)
        elif ch.isdigit():
            if i == 0:
                out.append("_")
            out.append(ch)
        else:
            out.append("_")
    return "".join(out)


def render_alertmanager(
    df: DataFrame,
    starts_at: Column,
    severity: Column,
    event_name: Column,
    labels: list[tuple[str, Column]] | None = None,
    annotations: list[tuple[str, Column]] | None = None,
    body: Column | None = None,
    trace_id: Column | None = None,
    span_id: Column | None = None,
    generator_url: str = "otel-collector",
    out: str = "body",
) -> DataFrame:
    """alertmanagerexporter POST payload (alertmanager_exporter.go:
    256-293): a JSON array of model.Alert. Labels carry the configured
    event_labels subset plus severity and event_name (createLogLabels,
    :239-254); annotations carry the record attributes plus TraceID/SpanID
    when present and the stringified Body (createLogAnnotations,
    :203-216); label keys pass sanitizeLabelName. startsAt is a column
    (the reference stamps non-deterministic time.Now()). Pure projection."""
    def kv_map(pairs, extra):
        keys, vals = [], []
        for k, v in pairs or []:
            keys.append(F.lit(_am_sanitize(k)))
            vals.append(v.cast("string"))
        for k, v in extra:
            keys.append(F.lit(k))
            vals.append(v.cast("string"))
        return F.map_filter(
            F.map_from_arrays(F.array(*keys), F.array(*vals)),
            lambda _k, v: v.isNotNull(),
        )

    lab = kv_map(labels, [("severity", severity), ("event_name", event_name)])
    ann_extra = []
    if trace_id is not None:
        ann_extra.append(("TraceID", trace_id))
    if span_id is not None:
        ann_extra.append(("SpanID", span_id))
    if body is not None:
        ann_extra.append(("Body", body))
    ann = kv_map(annotations, ann_extra)
    alert = F.struct(
        lab.alias("labels"),
        ann.alias("annotations"),
        F.date_format(starts_at, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("startsAt"),
        F.lit(generator_url).alias("generatorURL"),
    )
    return df.withColumn(out, F.to_json(F.array(alert)))


def render_mezmo(
    df: DataFrame,
    ts_ms: Column,
    line: Column,
    app: Column | None = None,
    level: Column | None = None,
    hostname: Column | None = None,
    trace_id: Column | None = None,
    meta: list[tuple[str, Column]] | None = None,
    out: str = "body",
) -> DataFrame:
    """mezmoexporter POST body (exporter.go:124-131,160-168): a
    `{"lines":[...]}` batch (one line per record here; batching is the
    sink's partition concern). Level truncates to 80 chars and defaults
    "info" (:119-122); line truncates to the 16 KiB maxMessageSize
    (config.go:29); hostname/trace.id fold into meta (:95-105)."""
    lvl = F.coalesce(F.nullif((level if level is not None else F.lit(None)).cast("string"), F.lit("")), F.lit("info"))
    entries = [(F.lit(k), v.cast("string")) for k, v in meta or []]
    if hostname is not None:
        entries.append((F.lit("hostname"), hostname.cast("string")))
    if trace_id is not None:
        entries.append((F.lit("trace.id"), trace_id.cast("string")))
    m = F.map_filter(
        F.map_from_arrays(F.array(*[k for k, _ in entries]), F.array(*[v for _, v in entries])),
        lambda _k, v: v.isNotNull(),
    ) if entries else F.expr("map()")
    rec = F.struct(
        ts_ms.cast("long").alias("timestamp"),
        F.substring(line.cast("string"), 1, 16 * 1024).alias("line"),
        F.coalesce(app.cast("string") if app is not None else F.lit(None).cast("string"), F.lit("")).alias("app"),
        F.substring(lvl, 1, 80).alias("level"),
        m.alias("meta"),
    )
    return df.withColumn(out, F.to_json(F.struct(F.array(rec).alias("lines"))))


def honeycomb_markers(
    df: DataFrame,
    markers: list[dict],
    path_map: dict[str, str] | None = None,
) -> DataFrame:
    """honeycombmarkerexporter (exporter/honeycombmarkerexporter/
    logs_exporter.go:70-131): each log record is tested against every
    configured marker's OTTL boolean condition; a match POSTs
    `{"type", "message"?, "url"?}` to /1/markers/{dataset} where message/
    url pull from the configured attribute keys and the dataset defaults
    "__all__" (:29,129-131). Here each marker spec is
    {type, condition (OTTL string), message_col?, url_col?, dataset?} —
    the condition compiles through the repo's OTTL statement compiler
    (functions/ottl_compiler.parse_condition) into a native filter, and
    matches fan out one row per (record, marker): hm_dataset, hm_type,
    hm_body (the sorted-key JSON Go's json.Marshal of the map emits).
    A when-chain projection per marker + one explode — no UDF."""
    from ..functions.ottl_compiler import parse_condition

    structs = []
    for m in markers:
        cond = parse_condition(m["condition"], path_map)
        message = F.col(m["message_col"]) if m.get("message_col") else F.lit(None)
        url = F.col(m["url_col"]) if m.get("url_col") else F.lit(None)
        body = F.to_json(
            F.struct(
                message.cast("string").alias("message"),
                F.lit(m["type"]).alias("type"),
                url.cast("string").alias("url"),
            )
        )
        structs.append(
            F.when(
                cond,
                F.struct(
                    F.lit(m.get("dataset") or "__all__").alias("hm_dataset"),
                    F.lit(m["type"]).alias("hm_type"),
                    body.alias("hm_body"),
                ),
            )
        )
    exploded = df.select(
        *df.columns, F.explode(F.filter(F.array(*structs), lambda s: s.isNotNull())).alias("_mk")
    )
    return exploded.select(
        *df.columns,
        F.col("_mk")["hm_dataset"].alias("hm_dataset"),
        F.col("_mk")["hm_type"].alias("hm_type"),
        F.col("_mk")["hm_body"].alias("hm_body"),
    )
