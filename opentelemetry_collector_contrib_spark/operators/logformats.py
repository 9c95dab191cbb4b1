"""SIEM log-format parsers: CEF, LEEF, CLF/Combined (+ exporter renders).

The reference ships these as transformprocessor log-context OTTL functions
(processor/transformprocessor/internal/logparsingfuncs/func_parse_{cef,leef,
clf}.go): ParseCEF (ArcSight Common Event Format — unescaped-pipe header
split, space-delimited `key=value` extensions whose values may contain
spaces), ParseLEEF (IBM QRadar LEEF 1.0/2.0 — optional delimiter field,
0x-hex delimiters, '=' disambiguation when the delimiter field is omitted),
and ParseCLF (Apache Common/Combined Log Format — quoted fields with
mod_log_config escapes incl. `\\xhh`).

Spark shape: CLF field extraction is a NATIVE regexp projection (the hot
path stays in whole-stage codegen); only the escape-bearing quoted-field
unescape plus the inherently stateful CEF/LEEF scans run as Arrow-batched
pandas UDFs returning one struct per line (compile-once per executor, the
parse_vectorized pattern). Malformed lines yield NULL structs — the
repo-wide on_error=send convention. Renders are pure native projections
(escape chains ordered backslash-first), giving render→parse round-trip
oracles the same way the Splunk HEC pair does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
# ---------------------------------------------------------------------------
# CEF (func_parse_cef.go)
# ---------------------------------------------------------------------------

def _cef_key_len(ext: str, i: int) -> int:
    # cefKeyLen: run of [A-Za-z0-9_] terminated by '=' (func_parse_cef.go:68-77)
    j = i
    while j < len(ext) and (ext[j].isascii() and (ext[j].isalnum() or ext[j] == "_")):
        j += 1
    if j > i and j < len(ext) and ext[j] == "=":
        return j - i
    return 0


def _cef_unescape_value(s: str) -> str:
    # unescapeCEFValue: \\ \= \n \r (func_parse_cef.go:198-230)
    if "\\" not in s:
        return s
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in ("\\", "="):
                out.append(nxt)
                i += 2
                continue
            if nxt == "n":
                out.append("\n")
                i += 2
                continue
            if nxt == "r":
                out.append("\r")
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _cef_unescape_header(s: str) -> str:
    # unescapeCEFHeader: \| and \\ only (func_parse_cef.go:176-195)
    if "\\" not in s:
        return s
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s) and s[i + 1] in ("|", "\\"):
            out.append(s[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _parse_cef_line(message: str):
    if not message:
        return None
    start = message.find("CEF:")
    if start < 0:
        return None
    msg = message[start:]
    # splitCEFHeader: split on unescaped pipes; field 8 = raw extension
    fields, cur, i = [], [], 0
    ext = None
    while i < len(msg):
        c = msg[i]
        if c == "\\" and i + 1 < len(msg) and msg[i + 1] in ("|", "\\"):
            cur.append(c)
            cur.append(msg[i + 1])
            i += 2
            continue
        if c == "|":
            fields.append("".join(cur))
            cur = []
            if len(fields) == 7:
                ext = msg[i + 1:]
                break
            i += 1
            continue
        cur.append(c)
        i += 1
    else:
        fields.append("".join(cur))
    if len(fields) < 7:
        return None
    version = fields[0][len("CEF:"):]
    if version == "":
        return None
    extensions = {}
    if ext:
        # parseCEFExtensions: keys at start-or-after-space; value runs to the
        # next key token; trailing spaces trimmed (func_parse_cef.go:232-263)
        have, key, vstart, i = False, None, 0, 0
        while i < len(ext):
            if i == 0 or ext[i - 1] == " ":
                klen = _cef_key_len(ext, i)
                if klen > 0:
                    if have:
                        extensions[key] = _cef_unescape_value(ext[vstart:i].rstrip(" "))
                    key = ext[i:i + klen]
                    vstart = i + klen + 1
                    have = True
                    i = vstart
                    continue
            i += 1
        if have:
            extensions[key] = _cef_unescape_value(ext[vstart:].rstrip(" "))
    return (
        version,
        _cef_unescape_header(fields[1]),
        _cef_unescape_header(fields[2]),
        _cef_unescape_header(fields[3]),
        _cef_unescape_header(fields[4]),
        _cef_unescape_header(fields[5]),
        _cef_unescape_header(fields[6]),
        extensions,
    )


_CEF_STRUCT = (
    "struct<cef_version:string,cef_device_vendor:string,cef_device_product:string,"
    "cef_device_version:string,cef_device_event_class_id:string,cef_name:string,"
    "cef_severity:string,cef_extensions:map<string,string>>"
)


def _cef_udf():
    # built lazily: pandas_udf needs an active session to parse the DDL type
    def fn(lines: pd.Series) -> pd.DataFrame:
        cols = ["cef_version", "cef_device_vendor", "cef_device_product",
                "cef_device_version", "cef_device_event_class_id", "cef_name",
                "cef_severity", "cef_extensions"]
        rows = [
            (_parse_cef_line(x) if isinstance(x, str) else None) or (None,) * 8
            for x in lines
        ]
        return pd.DataFrame(rows, columns=cols)

    return F.pandas_udf(fn, _CEF_STRUCT)


def parse_cef(df: DataFrame, col: str = "body") -> DataFrame:
    """ParseCEF: typed cef_* columns + cef_extensions map; malformed lines
    yield NULLs. Arrow-batched single pass."""
    out = df.withColumn("_cef", _cef_udf()(F.col(col)))
    for name in ("cef_version", "cef_device_vendor", "cef_device_product",
                 "cef_device_version", "cef_device_event_class_id", "cef_name",
                 "cef_severity", "cef_extensions"):
        out = out.withColumn(name, F.col(f"_cef.{name}"))
    return out.drop("_cef")


def render_cef(
    df: DataFrame,
    vendor: Column,
    product: Column,
    device_version: Column,
    event_class_id: Column,
    name: Column,
    severity: Column,
    extensions: list[tuple[str, Column]],
    out: str = "body",
    syslog_prefix: Column | None = None,
) -> DataFrame:
    """Native CEF:0 render. Header fields escape backslash-then-pipe; extension
    values escape backslash, '=', newline, CR (the inverse of ParseCEF)."""

    def esc_header(c: Column) -> Column:
        c = F.regexp_replace(c, r"\\", r"\\\\")
        return F.regexp_replace(c, r"\|", r"\\|")

    def esc_value(c: Column) -> Column:
        c = F.regexp_replace(c, r"\\", r"\\\\")
        c = F.regexp_replace(c, "=", r"\\=")
        c = F.regexp_replace(c, "\n", r"\\n")
        return F.regexp_replace(c, "\r", r"\\r")

    ext = F.concat_ws(
        " ", *[F.concat(F.lit(k + "="), esc_value(v.cast("string"))) for k, v in extensions]
    )
    header = F.concat_ws(
        "|",
        F.lit("CEF:0"),
        esc_header(vendor.cast("string")),
        esc_header(product.cast("string")),
        esc_header(device_version.cast("string")),
        esc_header(event_class_id.cast("string")),
        esc_header(name.cast("string")),
        esc_header(severity.cast("string")),
        ext,
    )
    if syslog_prefix is not None:
        header = F.concat(syslog_prefix, header)
    return df.withColumn(out, header)


# ---------------------------------------------------------------------------
# LEEF (func_parse_leef.go)
# ---------------------------------------------------------------------------

_LEEF_STRUCT = (
    "struct<leef_version:string,leef_vendor:string,leef_product_name:string,"
    "leef_product_version:string,leef_event_id:string,"
    "leef_attributes:map<string,string>>"
)


def _leef_delimiter(spec: str):
    # parseDelimiter: '' -> tab; 0xHH single byte; else single char (:188-214)
    if spec == "":
        return "\t"
    if spec[:2].lower() == "0x":
        hexstr = spec[2:]
        if len(hexstr) != 2:
            return None
        try:
            return chr(int(hexstr, 16))
        except ValueError:
            return None
    if len(spec) != 1:
        return None
    return spec


def _parse_leef_line(message: str):
    if not message:
        return None
    start = message.find("LEEF:")
    if start < 0:
        return None
    msg = message[start:]
    version_field, sep, remainder = msg.partition("|")
    if not sep:
        return None
    version = version_field[len("LEEF:"):]
    if version not in ("1.0", "2.0"):
        return None
    if version == "1.0":
        parts = remainder.split("|", 4)
        if len(parts) < 4:
            return None
        vendor, pname, pver, eid = parts[:4]
        delim = "\t"
        attributes = parts[4] if len(parts) == 5 else ""
    else:
        parts = remainder.split("|", 5)
        if len(parts) < 4:
            return None
        vendor, pname, pver, eid = parts[:4]
        if len(parts) == 4:
            delim, attributes = "\t", ""
        elif "=" in parts[4]:
            # delimiter field omitted, attributes present (:158-170)
            delim = "\t"
            attr_parts = remainder.split("|", 4)
            attributes = attr_parts[4] if len(attr_parts) == 5 else ""
        else:
            delim = _leef_delimiter(parts[4])
            if delim is None:
                return None
            attributes = parts[5] if len(parts) == 6 else ""
    attrs = {}
    if attributes:
        for pair in attributes.split(delim):
            if not pair:
                continue
            key, sep, value = pair.partition("=")
            if not sep or key == "":
                continue
            attrs[key] = value  # last occurrence wins (:216-241)
    return (version, vendor, pname, pver, eid, attrs)


def _leef_udf():
    def fn(lines: pd.Series) -> pd.DataFrame:
        cols = ["leef_version", "leef_vendor", "leef_product_name",
                "leef_product_version", "leef_event_id", "leef_attributes"]
        rows = [
            (_parse_leef_line(x) if isinstance(x, str) else None) or (None,) * 6
            for x in lines
        ]
        return pd.DataFrame(rows, columns=cols)

    return F.pandas_udf(fn, _LEEF_STRUCT)


def parse_leef(df: DataFrame, col: str = "body") -> DataFrame:
    """ParseLEEF (1.0 + 2.0): typed leef_* columns + attributes map."""
    out = df.withColumn("_leef", _leef_udf()(F.col(col)))
    for name in ("leef_version", "leef_vendor", "leef_product_name",
                 "leef_product_version", "leef_event_id", "leef_attributes"):
        out = out.withColumn(name, F.col(f"_leef.{name}"))
    return out.drop("_leef")


def render_leef(
    df: DataFrame,
    vendor: Column,
    product: Column,
    product_version: Column,
    event_id: Column,
    attributes: list[tuple[str, Column]],
    version: Column | None = None,
    delimiter_spec: str = "0x09",
    out: str = "body",
) -> DataFrame:
    """Native LEEF render. `version` is a '1.0'/'2.0' column (default 2.0);
    1.0 rows always use the tab delimiter and omit the delimiter field.
    Values must not contain the delimiter (LEEF has no value escaping)."""
    delim = _leef_delimiter(delimiter_spec)
    if delim is None:
        raise ValueError(f"invalid LEEF delimiter spec: {delimiter_spec}")
    ver = version if version is not None else F.lit("2.0")
    attrs_v2 = F.concat_ws(
        delim, *[F.concat(F.lit(k + "="), v.cast("string")) for k, v in attributes]
    )
    attrs_v1 = F.concat_ws(
        "\t", *[F.concat(F.lit(k + "="), v.cast("string")) for k, v in attributes]
    )
    head = F.concat_ws(
        "|", F.concat(F.lit("LEEF:"), ver), vendor.cast("string"),
        product.cast("string"), product_version.cast("string"), event_id.cast("string"),
    )
    line = F.when(
        ver == "2.0",
        F.concat_ws("|", head, F.lit(delimiter_spec), attrs_v2),
    ).otherwise(F.concat_ws("|", head, attrs_v1))
    return df.withColumn(out, line)


# ---------------------------------------------------------------------------
# CLF / Combined (func_parse_clf.go)
# ---------------------------------------------------------------------------

_CLF_QUOTED = r'"((?:[^"\\]|\\.)*)"'
_CLF_RE = r"^(\S+) (\S+) (\S+) \[([^\]]+)\] " + _CLF_QUOTED + r" (\S+) (\S+)"
_COMBINED_RE = _CLF_RE + " " + _CLF_QUOTED + " " + _CLF_QUOTED + "$"
_CLF_ONLY_RE = _CLF_RE + "$"

_CLF_ESCAPES = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r",
                "b": "\b", "f": "\f", "v": "\v"}


def _clf_unescape(s: str) -> str:
    # unescapeCLF: C escapes + \xhh, left-to-right single pass (:88-135)
    if not isinstance(s, str) or "\\" not in s:
        return s
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c != "\\" or i + 1 == len(s):
            out.append(c)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt in _CLF_ESCAPES:
            out.append(_CLF_ESCAPES[nxt])
            i += 2
            continue
        if nxt == "x":
            hexpart = s[i + 2:i + 4]
            if len(hexpart) == 2:
                try:
                    out.append(chr(int(hexpart, 16)))
                    i += 4
                    continue
                except ValueError:
                    pass
            out.append("\\x")
            i += 2
            continue
        out.append("\\")
        out.append(nxt)
        i += 2
    return "".join(out)


def _clf_unescape_udf():
    def fn(s: pd.Series) -> pd.Series:
        return s.map(_clf_unescape, na_action="ignore")

    return F.pandas_udf(fn, "string")


def parse_clf(df: DataFrame, col: str = "body", format: str = "clf") -> DataFrame:
    """ParseCLF: Common ('clf') or NCSA Combined ('combined') log lines ->
    typed clf_* columns. Field extraction is a NATIVE regexp projection
    (stays in codegen); only the mod_log_config unescape of the quoted
    fields (\\", \\\\, C escapes, \\xhh — inherently left-to-right) is an
    Arrow-batched UDF. Non-matching lines -> NULLs; '-' bytes -> NULL;
    non-integer status -> NULL (on_error=send)."""
    if format not in ("clf", "combined"):
        raise ValueError(f'invalid format {format!r}: must be "clf" or "combined"')
    pat = _CLF_ONLY_RE if format == "clf" else _COMBINED_RE
    src = F.trim(F.col(col))
    matched = src.rlike(pat)

    def grp(i: int) -> Column:
        return F.when(matched, F.regexp_extract(src, pat, i))

    unescape = _clf_unescape_udf()
    request = unescape(grp(5))
    req_parts = F.split(request, " ", 3)
    out = (
        df.withColumn("clf_remote_host", grp(1))
        .withColumn("clf_rfc931", grp(2))
        .withColumn("clf_auth_user", grp(3))
        .withColumn("clf_timestamp", grp(4))
        .withColumn("clf_request", request)
        .withColumn(
            "clf_method", F.when(F.size(req_parts) == 3, F.element_at(req_parts, 1))
        )
        .withColumn(
            "clf_request_uri", F.when(F.size(req_parts) == 3, F.element_at(req_parts, 2))
        )
        .withColumn(
            "clf_protocol", F.when(F.size(req_parts) == 3, F.element_at(req_parts, 3))
        )
        .withColumn("clf_status", grp(6).try_cast("bigint"))
        .withColumn(
            "clf_bytes",
            F.when(grp(7) != "-", grp(7).try_cast("bigint")),
        )
    )
    if format == "combined":
        out = out.withColumn("clf_referer", unescape(grp(8))).withColumn(
            "clf_user_agent", unescape(grp(9))
        )
    return out


def render_clf(
    df: DataFrame,
    remote_host: Column,
    auth_user: Column,
    timestamp: Column,
    request: Column,
    status: Column,
    nbytes: Column,
    referer: Column | None = None,
    user_agent: Column | None = None,
    out: str = "body",
) -> DataFrame:
    """Native CLF/Combined render (mod_log_config escaping of quoted fields:
    backslash then quote). bytes NULL renders '-'. Passing referer+user_agent
    produces the Combined format."""

    def esc(c: Column) -> Column:
        c = F.regexp_replace(c.cast("string"), r"\\", r"\\\\")
        return F.regexp_replace(c, '"', r"\\\"")

    parts = [
        remote_host.cast("string"), F.lit("-"), auth_user.cast("string"),
        F.concat(F.lit("["), timestamp.cast("string"), F.lit("]")),
        F.concat(F.lit('"'), esc(request), F.lit('"')),
        status.cast("string"),
        F.coalesce(nbytes.cast("string"), F.lit("-")),
    ]
    if referer is not None and user_agent is not None:
        parts.append(F.concat(F.lit('"'), esc(referer), F.lit('"')))
        parts.append(F.concat(F.lit('"'), esc(user_agent), F.lit('"')))
    return df.withColumn(out, F.concat_ws(" ", *parts))
