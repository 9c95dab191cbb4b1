"""Windows Event XML parse vs the windowseventlogreceiver mapping
(pkg/stanza/operator/input/windows/xml.go: parseSeverity :52-78,
formattedBody :81-165, parseEventData :185-224)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.winevent import (
    parse_windows_event,
)

_XML = (
    '<Event xmlns="http://schemas.microsoft.com/win/2004/08/events/event"><System>'
    '<Provider Name="Microsoft-Windows-Security-Auditing" Guid="{54849625-5478-4994-a5ba-3e3b0328c30d}"/>'
    '<EventID Qualifiers="16384">4624</EventID><Version>2</Version><Level>0</Level>'
    "<Task>12544</Task><Opcode>0</Opcode><Keywords>0x8020000000000000</Keywords>"
    '<TimeCreated SystemTime="2023-10-12T08:15:23.123456Z"/>'
    "<EventRecordID>98765</EventRecordID>"
    '<Execution ProcessID="612" ThreadID="1040"/>'
    "<Channel>Security</Channel><Computer>WIN-HOST</Computer>"
    '<Security UserID="S-1-5-18"/></System>'
    '<EventData><Data Name="SubjectUserSid">S-1-5-18</Data>'
    '<Data Name="LogonType">3</Data><Data>anonA</Data><Data>anonB</Data></EventData>'
    '<RenderingInfo Culture="en-US"><Message>An account was successfully logged on.</Message>'
    "<Level>Information</Level><Task>Logon</Task><Opcode>Info</Opcode>"
    "<Keywords><Keyword>Audit Success</Keyword><Keyword>KW2</Keyword></Keywords>"
    "</RenderingInfo></Event>"
)


def _parse(spark, *bodies):
    df = spark.createDataFrame([(b,) for b in bodies], "body string")
    return parse_windows_event(df, "body").collect()


def test_full_event_surface(spark):
    r, = _parse(spark, _XML)
    assert (r["we_id"], r["we_qualifiers"]) == (4624, 16384)
    assert r["we_provider"] == "Microsoft-Windows-Security-Auditing"
    assert r["we_provider_guid"] == "{54849625-5478-4994-a5ba-3e3b0328c30d}"
    assert (r["we_computer"], r["we_channel"], r["we_record_id"]) == ("WIN-HOST", "Security", 98765)
    assert r["we_system_time"] == "2023-10-12T08:15:23.123456Z"
    assert r["we_ts_us"] == 1697098523_123456
    # RenderingInfo overrides level/task/opcode/keywords (formattedBody)
    assert (r["we_level"], r["we_task"], r["we_opcode"]) == ("Information", "Logon", "Info")
    assert r["we_keywords_csv"] == "Audit Success,KW2"
    assert (r["we_severity"], r["we_severity_num"]) == ("INFO", 9)
    assert r["we_message"] == "An account was successfully logged on."
    # parseEventData map format: named keys + paramN for anonymous elements
    assert r["we_event_data_csv"] == "SubjectUserSid=S-1-5-18,LogonType=3,param1=anonA,param2=anonB"
    assert (r["we_user_id"], r["we_pid"], r["we_tid"]) == ("S-1-5-18", 612, 1040)
    assert r["we_version"] == 2


def test_severity_numeric_fallback_without_rendering_info(spark):
    # parseSeverity second branch: numeric System Level when rendered is absent
    cases = {"1": ("FATAL", 21), "2": ("ERROR", 17), "3": ("WARN", 13),
             "4": ("INFO", 9), "0": ("DEFAULT", 0), "9": ("DEFAULT", 0)}
    bodies = [
        f"<Event><System><EventID>1</EventID><Level>{lvl}</Level>"
        f"<Channel>App</Channel></System></Event>"
        for lvl in cases
    ]
    rows = _parse(spark, *bodies)
    got = {lvl: (r["we_severity"], r["we_severity_num"]) for lvl, r in zip(cases, rows)}
    assert got == cases
    # without RenderingInfo the raw System values pass through
    assert rows[0]["we_level"] == "1" and rows[0]["we_message"] is None


def test_rendered_severity_names(spark):
    for name, (sev, num) in {"Critical": ("FATAL", 21), "Error": ("ERROR", 17),
                             "Warning": ("WARN", 13), "Information": ("INFO", 9),
                             "Verbose": ("DEFAULT", 0)}.items():
        body = (
            "<Event><System><EventID>1</EventID><Level>4</Level></System>"
            f"<RenderingInfo><Message>m</Message><Level>{name}</Level></RenderingInfo></Event>"
        )
        r, = _parse(spark, body)
        assert (r["we_severity"], r["we_severity_num"]) == (sev, num), name


def test_optional_sections_null_and_malformed_xml(spark):
    minimal = "<Event><System><EventID>7</EventID></System></Event>"
    r, = _parse(spark, minimal)
    assert r["we_id"] == 7 and r["we_qualifiers"] is None
    assert r["we_pid"] is None and r["we_user_id"] is None
    assert r["we_event_data_csv"] is None
    # garbage timestamp -> NULL (deterministic; the reference falls back to
    # time.Now(), xml.go:44-49 — documented deviation)
    bad_ts = ('<Event><System><EventID>7</EventID>'
              '<TimeCreated SystemTime="not-a-time"/></System></Event>')
    r, = _parse(spark, bad_ts)
    assert r["we_system_time"] == "not-a-time" and r["we_ts_us"] is None
    # malformed XML -> all-NULL row (on_error=send)
    r, = _parse(spark, "<Event><System>broken")
    assert r["we_id"] is None and r["we_severity"] == "DEFAULT"


def test_plan_is_native_projection(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(_XML,)], "body string")
    out = parse_windows_event(df, "body")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"plan contains {node}"
