"""Windows Event Log XML parse — the windowseventlogreceiver's event
mapping re-expressed as a pure from_xml projection.

The reference's input operator (pkg/stanza/operator/input/windows) renders
each event to the Event XML schema and flattens it into an entry body via
xml.go: EventXML fields (xml.go:17-41), severity from the rendered level
falling back to the numeric System Level (parseSeverity, xml.go:52-78),
RenderingInfo overriding level/task/opcode/keywords when present
(formattedBody, xml.go:81-165), and EventData Data elements becoming a map
where anonymous elements take numbered `paramN` keys (parseEventData,
xml.go:185-224). The live subscription API is a host-OS surface (SURVEY
§2.1 out of scope); THIS operator covers the data transform — an XML
string column (exported .evtx renders, forwarded events) to the same flat
surface.

Everything is native Spark: one from_xml against a typed schema plus
when-chain/HOF projections — zero Python, zero shuffle, whole plan inside
codegen/expression eval, so the parse runs at scan speed on any number of
splits. Deviations, documented: parseTimestamp falls back to time.Now()
on unparsable SystemTime (xml.go:44-49) — non-deterministic, so here it
yields NULL; the Security-channel message/details splitter
(security_windows.go parseSecurity) is a rendered-text heuristic and is
not reimplemented — the raw message passes through."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_XML_SCHEMA = T.StructType([
    T.StructField("System", T.StructType([
        T.StructField("Provider", T.StructType([
            T.StructField("_Name", T.StringType()),
            T.StructField("_Guid", T.StringType()),
            T.StructField("_EventSourceName", T.StringType()),
        ])),
        T.StructField("EventID", T.StructType([
            T.StructField("_Qualifiers", T.LongType()),
            T.StructField("_VALUE", T.LongType()),
        ])),
        T.StructField("Version", T.IntegerType()),
        T.StructField("Level", T.StringType()),
        T.StructField("Task", T.StringType()),
        T.StructField("Opcode", T.StringType()),
        T.StructField("Keywords", T.StringType()),
        T.StructField("TimeCreated", T.StructType([
            T.StructField("_SystemTime", T.StringType()),
        ])),
        T.StructField("EventRecordID", T.LongType()),
        T.StructField("Correlation", T.StructType([
            T.StructField("_ActivityID", T.StringType()),
            T.StructField("_RelatedActivityID", T.StringType()),
        ])),
        T.StructField("Execution", T.StructType([
            T.StructField("_ProcessID", T.LongType()),
            T.StructField("_ThreadID", T.LongType()),
        ])),
        T.StructField("Channel", T.StringType()),
        T.StructField("Computer", T.StringType()),
        T.StructField("Security", T.StructType([
            T.StructField("_UserID", T.StringType()),
        ])),
    ])),
    T.StructField("EventData", T.StructType([
        T.StructField("Data", T.ArrayType(T.StructType([
            T.StructField("_Name", T.StringType()),
            T.StructField("_VALUE", T.StringType()),
        ]))),
        T.StructField("Binary", T.StringType()),
    ])),
    T.StructField("RenderingInfo", T.StructType([
        T.StructField("Message", T.StringType()),
        T.StructField("Level", T.StringType()),
        T.StructField("Task", T.StringType()),
        T.StructField("Opcode", T.StringType()),
        T.StructField("Keywords", T.StructType([
            T.StructField("Keyword", T.ArrayType(T.StringType())),
        ])),
    ])),
])


def _severity(rendered: Column, level: Column) -> Column:
    """parseSeverity (xml.go:52-78): rendered level names win; an empty or
    absent rendered level falls back to the numeric System Level."""
    by_name = (
        F.when(rendered == "Critical", "FATAL")
        .when(rendered == "Error", "ERROR")
        .when(rendered == "Warning", "WARN")
        .when(rendered == "Information", "INFO")
        .otherwise("DEFAULT")
    )
    by_num = (
        F.when(level == "1", "FATAL")
        .when(level == "2", "ERROR")
        .when(level == "3", "WARN")
        .when(level == "4", "INFO")
        .otherwise("DEFAULT")
    )
    return F.when(rendered.isNull() | (rendered == ""), by_num).otherwise(by_name)


def parse_windows_event(df: DataFrame, source: str = "body") -> DataFrame:
    """Flatten Event XML strings into the formattedBody surface
    (xml.go:81-165). Adds we_* columns; malformed XML yields NULLs (the
    on_error=send convention). Effective level/task/opcode/keywords apply
    the RenderingInfo override; we_event_data_csv renders the EventData
    map in document order with parseEventData's anonymous `paramN`
    numbering; we_ts_us is NULL when SystemTime cannot parse."""
    ev = F.from_xml(F.col(source), EVENT_XML_SCHEMA)
    d = df.withColumn("_we", ev)
    sysc = F.col("_we.System")
    ri = F.col("_we.RenderingInfo")
    rendered_kw = F.col("_we.RenderingInfo.Keywords.Keyword")
    eff = lambda name: F.coalesce(  # noqa: E731 — RenderingInfo override
        F.nullif(ri.getField(name), F.lit("")), sysc.getField(name)
    )
    data_csv = F.expr(
        "array_join(transform(_we.EventData.Data, (d, i) -> concat("
        " coalesce(d._Name, concat('param', cast(size(filter("
        "   slice(_we.EventData.Data, 1, i + 1), x -> x._Name is null)) as string))),"
        " '=', coalesce(d._VALUE, ''))), ',')"
    )
    out = d.select(
        *[F.col(f.name) for f in df.schema.fields],
        sysc.getField("EventID").getField("_VALUE").alias("we_id"),
        sysc.getField("EventID").getField("_Qualifiers").alias("we_qualifiers"),
        sysc.getField("Provider").getField("_Name").alias("we_provider"),
        sysc.getField("Provider").getField("_Guid").alias("we_provider_guid"),
        sysc.getField("Computer").alias("we_computer"),
        sysc.getField("Channel").alias("we_channel"),
        sysc.getField("EventRecordID").alias("we_record_id"),
        sysc.getField("TimeCreated").getField("_SystemTime").alias("we_system_time"),
        F.unix_micros(
            F.expr("try_cast(_we.System.TimeCreated._SystemTime as timestamp)")
        ).alias("we_ts_us"),
        eff("Level").alias("we_level"),
        eff("Task").alias("we_task"),
        eff("Opcode").alias("we_opcode"),
        F.coalesce(
            F.array_join(rendered_kw, ","), sysc.getField("Keywords")
        ).alias("we_keywords_csv"),
        _severity(ri.getField("Level"), sysc.getField("Level")).alias("we_severity"),
        F.element_at(
            F.create_map(
                F.lit("FATAL"), F.lit(21), F.lit("ERROR"), F.lit(17),
                F.lit("WARN"), F.lit(13), F.lit("INFO"), F.lit(9),
                F.lit("DEFAULT"), F.lit(0),
            ),
            _severity(ri.getField("Level"), sysc.getField("Level")),
        ).alias("we_severity_num"),
        ri.getField("Message").alias("we_message"),
        data_csv.alias("we_event_data_csv"),
        F.col("_we.EventData.Binary").alias("we_binary"),
        sysc.getField("Security").getField("_UserID").alias("we_user_id"),
        sysc.getField("Execution").getField("_ProcessID").alias("we_pid"),
        sysc.getField("Execution").getField("_ThreadID").alias("we_tid"),
        sysc.getField("Correlation").getField("_ActivityID").alias("we_activity_id"),
        sysc.getField("Version").alias("we_version"),
    )
    return out


def render_windows_event(
    df: DataFrame,
    id_col: str = "we_id",
    dest: str = "body",
) -> DataFrame:
    """Deterministic Event XML render for fixtures and round trips — the
    inverse direction (a collector writing .evtx-style XML). Pure string
    concat projection; optional sections (Qualifiers, RenderingInfo,
    Execution, Security, anonymous Data) render only when their driving
    column is non-null, so the parser's null paths get exercised."""
    c = F.col
    opt = lambda cond, col: F.when(cond, col).otherwise(F.lit(""))  # noqa: E731
    xml = F.concat(
        F.lit('<Event xmlns="http://schemas.microsoft.com/win/2004/08/events/event"><System>'),
        F.lit('<Provider Name="'), c("we_provider"), F.lit('" Guid="'), c("we_provider_guid"), F.lit('"/>'),
        F.lit("<EventID"),
        opt(c("we_qualifiers").isNotNull(),
            F.concat(F.lit(' Qualifiers="'), c("we_qualifiers").cast("string"), F.lit('"'))),
        F.lit(">"), c(id_col).cast("string"), F.lit("</EventID>"),
        F.lit("<Version>"), c("we_version").cast("string"), F.lit("</Version>"),
        F.lit("<Level>"), c("we_level_raw"), F.lit("</Level>"),
        F.lit("<Task>"), c("we_task_raw"), F.lit("</Task>"),
        F.lit("<Opcode>"), c("we_opcode_raw"), F.lit("</Opcode>"),
        F.lit("<Keywords>"), c("we_keywords_raw"), F.lit("</Keywords>"),
        F.lit('<TimeCreated SystemTime="'), c("we_system_time"), F.lit('"/>'),
        F.lit("<EventRecordID>"), c("we_record_id").cast("string"), F.lit("</EventRecordID>"),
        opt(c("we_pid").isNotNull(),
            F.concat(F.lit('<Execution ProcessID="'), c("we_pid").cast("string"),
                     F.lit('" ThreadID="'), c("we_tid").cast("string"), F.lit('"/>'))),
        F.lit("<Channel>"), c("we_channel"), F.lit("</Channel>"),
        F.lit("<Computer>"), c("we_computer"), F.lit("</Computer>"),
        opt(c("we_user_id").isNotNull(),
            F.concat(F.lit('<Security UserID="'), c("we_user_id"), F.lit('"/>'))),
        F.lit("</System><EventData>"),
        c("we_data_xml"),
        F.lit("</EventData>"),
        opt(
            c("we_message").isNotNull(),
            F.concat(
                F.lit('<RenderingInfo Culture="en-US"><Message>'), c("we_message"),
                F.lit("</Message><Level>"), c("we_level_rendered"),
                F.lit("</Level><Task>"), c("we_task_rendered"),
                F.lit("</Task><Opcode>"), c("we_opcode_rendered"),
                F.lit("</Opcode><Keywords>"), c("we_keywords_rendered_xml"),
                F.lit("</Keywords></RenderingInfo>"),
            ),
        ),
        F.lit("</Event>"),
    )
    return df.withColumn(dest, xml)
