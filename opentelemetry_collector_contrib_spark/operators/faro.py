"""Grafana Faro web-SDK payload <-> log rows.

The faroreceiver accepts the browser SDK's JSON payload (logs,
exceptions, measurements, events + shared meta) and the faro translator
(`pkg/translator/faro/faro_to_logs.go`, `keyval.go`) flattens every item
into one logfmt-style key/value record merged with the meta block:
kind/timestamp/level plus per-kind fields ("message" for logs,
"type"/"value" for exceptions, "type" + %f-formatted values for
measurements, "event_name"/"event_domain" for events), context under
`context_` (keyval.go:91), event attributes under `event_data_`
(logs_to_faro.go:104), measurement values additionally under `value_`
(:119), app/session/user meta as `app_*`/`session_id`/`user_id`
(:38-44,:86).

Spark shape: one from_json + four explodes unioned — a pure projection
per kind, no UDF; at 100 TB this stays inside whole-stage codegen and
the union is plan-parallel over the same scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FARO_SCHEMA = (
    "struct<"
    "logs: array<struct<timestamp: string, message: string, level: string,"
    "  context: map<string,string>>>,"
    "exceptions: array<struct<timestamp: string, type: string, value: string,"
    "  context: map<string,string>>>,"
    "measurements: array<struct<timestamp: string, type: string,"
    "  values: map<string,double>, context: map<string,string>>>,"
    "events: array<struct<timestamp: string, name: string, domain: string,"
    "  attributes: map<string,string>>>,"
    "meta: struct<"
    "  app: struct<name: string, version: string, environment: string>,"
    "  session: struct<id: string>,"
    "  user: struct<id: string>>>"
)


def _kv_csv(*maps: tuple[str, Column]) -> Column:
    """Merge (prefix, map) pairs into the canonical sorted k=v CSV."""
    def _prefixed(p):
        # closure factory, NOT a two-arg lambda: F.transform treats a
        # second lambda parameter as the array index
        return lambda e: F.concat(F.lit(p), e["key"], F.lit("="), e["value"])

    parts = [
        F.transform(F.map_entries(F.coalesce(m, F.expr("map()"))), _prefixed(prefix))
        for prefix, m in maps
    ]
    joined = F.array_join(F.array_sort(F.concat(*parts)), ",")
    return F.when(joined != "", joined)


def parse_faro(df: DataFrame, source: str = "body") -> DataFrame:
    """One row per faro item (log/exception/measurement/event), meta
    columns repeated per item — the columnar image of the translator's
    merged keyVal records. Measurement values keep the reference's `%f`
    rendering in the CSV (keyValFromFloatMap) and land under `value_`."""
    p = F.from_json(F.col(source), _FARO_SCHEMA)
    step = df.select(*df.columns, p.alias("_fp")).where(F.col("_fp").isNotNull())
    meta = F.col("_fp")["meta"]
    meta_cols = [
        meta["app"]["name"].alias("fr_app_name"),
        meta["app"]["version"].alias("fr_app_version"),
        meta["app"]["environment"].alias("fr_app_environment"),
        meta["session"]["id"].alias("fr_session_id"),
        meta["user"]["id"].alias("fr_user_id"),
    ]

    def kind_rows(arr: Column, kind: str, item_cols) -> DataFrame:
        it = F.col("_it")
        e = step.select(*df.columns, *meta_cols, F.explode(arr).alias("_it"))
        return e.select(
            *df.columns,
            F.lit(kind).alias("fr_kind"),
            it["timestamp"].alias("fr_timestamp"),
            *item_cols(it),
            *[F.col(c) for c in (
                "fr_app_name", "fr_app_version", "fr_app_environment",
                "fr_session_id", "fr_user_id",
            )],
        )

    logs = kind_rows(
        F.col("_fp")["logs"], "log",
        lambda it: [
            # default to info level, prioritize log level if set (keyval.go:82-85)
            F.coalesce(F.nullif(it["level"], F.lit("")), F.lit("info")).alias("fr_level"),
            it["message"].alias("fr_message"),
            F.lit(None).cast("string").alias("fr_type"),
            F.lit(None).cast("string").alias("fr_event_name"),
            _kv_csv(("context_", it["context"])).alias("fr_kv_csv"),
        ],
    )
    excs = kind_rows(
        F.col("_fp")["exceptions"], "exception",
        lambda it: [
            F.lit("error").alias("fr_level"),  # keyval.go:102
            # exceptionMessage: "<type>: <value>" (keyval.go:116-118)
            F.concat(it["type"], F.lit(": "), it["value"]).alias("fr_message"),
            it["type"].alias("fr_type"),
            F.lit(None).cast("string").alias("fr_event_name"),
            _kv_csv(("context_", it["context"])).alias("fr_kv_csv"),
        ],
    )
    meas = kind_rows(
        F.col("_fp")["measurements"], "measurement",
        lambda it: [
            F.lit("info").alias("fr_level"),
            F.lit(None).cast("string").alias("fr_message"),
            it["type"].alias("fr_type"),
            F.lit(None).cast("string").alias("fr_event_name"),
            _kv_csv(
                ("value_", F.map_from_entries(
                    F.transform(
                        F.map_entries(F.coalesce(it["values"], F.expr("map()"))),
                        lambda e: F.struct(
                            e["key"].alias("key"),
                            F.format_string("%f", e["value"]).alias("value"),
                        ),
                    )
                )),
                ("context_", it["context"]),
            ).alias("fr_kv_csv"),
        ],
    )
    events = kind_rows(
        F.col("_fp")["events"], "event",
        lambda it: [
            F.lit("info").alias("fr_level"),
            F.lit(None).cast("string").alias("fr_message"),
            F.lit(None).cast("string").alias("fr_type"),
            it["name"].alias("fr_event_name"),
            _kv_csv(("event_data_", it["attributes"])).alias("fr_kv_csv"),
        ],
    )
    return logs.unionByName(excs).unionByName(meas).unionByName(events)


def render_faro(
    df: DataFrame,
    ts: Column,
    app_name: Column,
    session_id: Column,
    log_message: Column | None = None,
    log_level: Column | None = None,
    log_context: list[tuple[str, Column]] | None = None,
    exception: tuple[Column, Column] | None = None,
    measurement: tuple[Column, list[tuple[str, Column]]] | None = None,
    event: tuple[Column, list[tuple[str, Column]]] | None = None,
    out: str = "body",
) -> DataFrame:
    """Faro SDK payload JSON (what a browser agent POSTs to the
    faroreceiver's /collect endpoint): optional one item per kind.
    `exception` = (type, value); `measurement` = (type, [(name, value)]);
    `event` = (name, [(attr, value)]). Timestamps render RFC3339-millis.
    A NULL first element drops that kind's array for the row."""
    ts_str = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

    def kv_map(pairs):
        return F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k, _ in pairs]),
                F.array(*[v.cast("string") for _, v in pairs]),
            ),
            lambda _k, v: v.isNotNull(),
        )

    fields = []
    if log_message is not None:
        log = F.struct(
            ts_str.alias("timestamp"),
            log_message.cast("string").alias("message"),
            (log_level if log_level is not None else F.lit("info")).alias("level"),
            *( [kv_map(log_context).alias("context")] if log_context else [] ),
        )
        fields.append(F.when(log_message.isNotNull(), F.array(log)).alias("logs"))
    if exception is not None:
        etype, evalue = exception
        exc = F.struct(
            ts_str.alias("timestamp"),
            etype.cast("string").alias("type"),
            evalue.cast("string").alias("value"),
        )
        fields.append(F.when(etype.isNotNull(), F.array(exc)).alias("exceptions"))
    if measurement is not None:
        mtype, mvals = measurement
        m = F.struct(
            ts_str.alias("timestamp"),
            mtype.cast("string").alias("type"),
            F.map_from_arrays(
                F.array(*[F.lit(k) for k, _ in mvals]),
                F.array(*[v.cast("double") for _, v in mvals]),
            ).alias("values"),
        )
        fields.append(F.when(mtype.isNotNull(), F.array(m)).alias("measurements"))
    if event is not None:
        ename, eattrs = event
        evt = F.struct(
            ts_str.alias("timestamp"),
            ename.cast("string").alias("name"),
            *( [kv_map(eattrs).alias("attributes")] if eattrs else [] ),
        )
        fields.append(F.when(ename.isNotNull(), F.array(evt)).alias("events"))
    meta = F.struct(
        F.struct(app_name.cast("string").alias("name")).alias("app"),
        F.struct(session_id.cast("string").alias("id")).alias("session"),
    )
    return df.withColumn(out, F.to_json(F.struct(*fields, meta.alias("meta"))))
