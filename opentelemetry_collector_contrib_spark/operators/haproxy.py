"""haproxyreceiver: HAProxy `show stat` CSV → typed metric rows.

The reference scrapes the stats socket / `;csv` endpoint, strips the `# `
prefix from the header row, maps every record to a name→value dict keyed by
that header, skips empty-string fields, and emits one resource per record
with `haproxy.proxy_name` = pxname, `haproxy.service_name` = svname and
`haproxy.server.state` = status plus ~30 integer datapoints
(receiver/haproxyreceiver/scraper.go:40-293, readStats at scraper.go:295).

Spark shape: the header is parsed ONCE on the driver into name→position,
so per-line extraction is a pure `split` + `get` projection — the
whole parse stays in whole-stage codegen, no UDF. HAProxy's CSV never
quotes and values never contain commas (it is a machine-generated numeric
table), so `split` IS the csv.Reader here. Empty string → NULL (the
scraper's `record[x] != ""` skip); a non-numeric value in a numeric slot
nulls that field under try-cast semantics, mirroring the per-field
scrape-error accumulation (scraper.go:25-29) instead of failing the batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# header exactly as emitted by `show stat` (testdata/stats.txt:1), `# ` removed
DEFAULT_HEADER = (
    "pxname,svname,qcur,qmax,scur,smax,slim,stot,bin,bout,dreq,dresp,ereq,"
    "econ,eresp,wretr,wredis,status,weight,act,bck,chkfail,chkdown,lastchg,"
    "downtime,qlimit,pid,iid,sid,throttle,lbtot,tracked,type,rate,rate_lim,"
    "rate_max,check_status,check_code,check_duration,hrsp_1xx,hrsp_2xx,"
    "hrsp_3xx,hrsp_4xx,hrsp_5xx,hrsp_other,hanafail,req_rate,req_rate_max,"
    "req_tot,cli_abrt,srv_abrt,comp_in,comp_out,comp_byp,comp_rsp,lastsess,"
    "last_chk,last_agt,qtime,ctime,rtime,ttime,agent_status,agent_code,"
    "agent_duration,check_desc,agent_desc,check_rise,check_fall,check_health,"
    "agent_rise,agent_fall,agent_health,addr,cookie,mode,algo,conn_rate,"
    "conn_rate_max,conn_tot,intercepted,dcon,dses"
)

# the exact field set scraper.go records (string fields first)
STRING_FIELDS = ("pxname", "svname", "status")
LONG_FIELDS = (
    "qcur", "scur", "slim", "stot", "bin", "bout", "dreq", "dresp", "ereq",
    "econ", "eresp", "wretr", "wredis", "weight", "act", "bck", "chkfail",
    "downtime", "lbtot", "rate", "req_rate", "req_tot", "cli_abrt",
    "srv_abrt", "comp_in", "comp_out", "comp_byp", "comp_rsp", "conn_rate",
    "conn_tot", "qtime", "ctime", "rtime", "ttime", "hrsp_1xx", "hrsp_2xx",
    "hrsp_3xx", "hrsp_4xx", "hrsp_5xx", "hrsp_other",
)


def parse_haproxy_stats(
    df: DataFrame, col: str, header: str = DEFAULT_HEADER, prefix: str = "hap_"
) -> DataFrame:
    """Parse one `show stat` record line per row into typed columns.

    Leading `# ` (a header line fed through) yields NULL pxname etc. —
    callers filter on `hap_pxname IS NOT NULL` like readStats drops the
    header row after consuming it.
    """
    names = [h.strip() for h in header.split(",") if h.strip()]
    pos = {n: i for i, n in enumerate(names)}  # F.get is 0-based and ANSI-safe
    parts = F.split(F.col(col), ",", -1)
    cols = list(df.columns)
    out = []
    for n in STRING_FIELDS:
        if n not in pos:
            continue
        v = F.get(parts, pos[n])
        out.append(F.when(v != "", v).alias(f"{prefix}{n}"))
    for n in LONG_FIELDS:
        if n not in pos:
            continue
        v = F.get(parts, pos[n])
        out.append(
            F.when(v != "", v.try_cast("long")).alias(f"{prefix}{n}")
        )
    return df.select(*cols, *out)


def render_haproxy_stat(
    df: DataFrame,
    fields: dict[str, Column],
    header: str = DEFAULT_HEADER,
    out_col: str = "body",
) -> DataFrame:
    """Compose a `show stat` record line: every header slot not present in
    `fields` renders empty, exactly as HAProxy emits for inapplicable
    columns (frontends have no act/bck, backends no conn_rate)."""
    names = [h.strip() for h in header.split(",") if h.strip()]
    slots = []
    for n in names:
        if n in fields:
            slots.append(F.coalesce(fields[n].cast("string"), F.lit("")))
        else:
            slots.append(F.lit(""))
    # haproxy terminates every record with a trailing comma
    line = F.concat_ws(",", *slots, F.lit(""))
    return df.withColumn(out_col, line)
