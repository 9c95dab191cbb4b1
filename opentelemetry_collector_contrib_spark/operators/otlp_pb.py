"""OTLP protobuf logs decode — the collector's NATIVE wire format (what an
`otlp` receiver gets over gRPC/HTTP), complementing the OTLP/JSON
connectors. Field numbers follow the public opentelemetry-proto schema
(`opentelemetry/proto/logs/v1/logs.proto` and `common/v1/common.proto`):

  LogsData.resource_logs = 1
  ResourceLogs{ resource = 1, scope_logs = 2, schema_url = 3 }
  Resource{ attributes = 1 }
  ScopeLogs{ scope = 1, log_records = 2 }
  InstrumentationScope{ name = 1, version = 2 }
  LogRecord{ time_unix_nano = 1 (fixed64), severity_number = 2 (varint),
             severity_text = 3, body = 5 (AnyValue), attributes = 6,
             flags = 8 (fixed32), trace_id = 9, span_id = 10,
             observed_time_unix_nano = 11 (fixed64) }
  KeyValue{ key = 1, value = 2 }
  AnyValue oneof{ string=1, bool=2, int=3, double=4, array=5, kvlist=6,
                  bytes=7 }

Decoding protobuf is length-prefixed binary work — like msgpack and octet
framing it is the honest Arrow-batched pandas-UDF case. The reader is a
self-contained proto-wire subset (varint / fixed64 / length-delimited /
fixed32), not a vendored library; unknown fields are skipped by wire type
exactly as proto requires, so payloads from newer schema revisions still
decode."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- proto wire reader -------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message's bytes.
    wire 0 -> int, 1 -> 8 raw bytes, 2 -> bytes, 5 -> 4 raw bytes."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 0x07
        if wtype == 0:
            v, pos = _read_varint(buf, pos)
        elif wtype == 1:
            v, pos = buf[pos : pos + 8], pos + 8
            if len(v) != 8:
                raise ValueError("truncated fixed64")
        elif wtype == 2:
            n, pos = _read_varint(buf, pos)
            v, pos = buf[pos : pos + n], pos + n
            if len(v) != n:
                raise ValueError("truncated length-delimited field")
        elif wtype == 5:
            v, pos = buf[pos : pos + 4], pos + 4
            if len(v) != 4:
                raise ValueError("truncated fixed32")
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, v


def _zigzag_signed(v: int) -> int:
    """proto int64 varints are two's-complement in 64 bits (NOT zigzag)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _any_value(buf: bytes) -> object:
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            return v.decode("utf-8", errors="replace")
        if fnum == 2:
            return bool(v)
        if fnum == 3:
            return _zigzag_signed(v)
        if fnum == 4:
            return struct.unpack("<d", v)[0]
        if fnum == 5:  # ArrayValue{ values = 1 }
            return [_any_value(x) for f, _, x in _fields(v) if f == 1]
        if fnum == 6:  # KeyValueList{ values = 1 }
            return dict(_key_value(x) for f, _, x in _fields(v) if f == 1)
        if fnum == 7:
            return bytes(v)
    return None


def _key_value(buf: bytes) -> tuple[str, object]:
    key, val = "", None
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            key = v.decode("utf-8", errors="replace")
        elif fnum == 2:
            val = _any_value(v)
    return key, val


def _render(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_render(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _attrs_csv(pairs: list[tuple[str, object]]) -> str | None:
    return ",".join(f"{k}={_render(v)}" for k, v in sorted(pairs)) if pairs else None


def decode_logs_data(payload: bytes) -> list[dict]:
    """LogsData / ExportLogsServiceRequest bytes -> one dict per LogRecord,
    resource and scope context flattened onto each row (the pdata shape)."""
    rows = []
    for f1, _, rl in _fields(payload):
        if f1 != 1:
            continue
        res_attrs: list[tuple[str, object]] = []
        scopes = []
        for f2, _, v2 in _fields(rl):
            if f2 == 1:  # Resource
                res_attrs = [_key_value(x) for f, _, x in _fields(v2) if f == 1]
            elif f2 == 2:
                scopes.append(v2)
        for sl in scopes:
            scope_name = None
            records = []
            for f3, _, v3 in _fields(sl):
                if f3 == 1:
                    for f4, _, v4 in _fields(v3):
                        if f4 == 1:
                            scope_name = v4.decode("utf-8", errors="replace")
                elif f3 == 2:
                    records.append(v3)
            for lr in records:
                row = {
                    "ol_ts_us": None,
                    "ol_severity_number": None,
                    "ol_severity_text": None,
                    "ol_body": None,
                    "ol_attrs_csv": None,
                    "ol_trace_id": None,
                    "ol_span_id": None,
                    "ol_scope": scope_name,
                    "ol_resource_csv": _attrs_csv(res_attrs),
                }
                attrs: list[tuple[str, object]] = []
                for f4, _, v4 in _fields(lr):
                    if f4 == 1:
                        row["ol_ts_us"] = struct.unpack("<Q", v4)[0] // 1000
                    elif f4 == 2:
                        row["ol_severity_number"] = int(v4)
                    elif f4 == 3:
                        row["ol_severity_text"] = v4.decode("utf-8", errors="replace")
                    elif f4 == 5:
                        row["ol_body"] = _render(_any_value(v4))
                    elif f4 == 6:
                        attrs.append(_key_value(v4))
                    elif f4 == 9:
                        row["ol_trace_id"] = bytes(v4).hex()
                    elif f4 == 10:
                        row["ol_span_id"] = bytes(v4).hex()
                row["ol_attrs_csv"] = _attrs_csv(attrs)
                rows.append(row)
    return rows


_OL_FIELDS = [
    T.StructField("ol_ts_us", T.LongType()),
    T.StructField("ol_severity_number", T.IntegerType()),
    T.StructField("ol_severity_text", T.StringType()),
    T.StructField("ol_body", T.StringType()),
    T.StructField("ol_attrs_csv", T.StringType()),
    T.StructField("ol_trace_id", T.StringType()),
    T.StructField("ol_span_id", T.StringType()),
    T.StructField("ol_scope", T.StringType()),
    T.StructField("ol_resource_csv", T.StringType()),
]


def parse_otlp_pb_logs(df: DataFrame, source: str = "payload") -> DataFrame:
    """One row per LogRecord in each OTLP-protobuf payload. Malformed
    payloads drop (receiver rejects the request). Arrow-batched."""
    passthrough = [f for f in df.schema.fields if f.name != source]
    names = [f.name for f in passthrough]
    out_schema = T.StructType([*passthrough, *_OL_FIELDS])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = rec[source]
                if payload is None:
                    continue
                try:
                    decoded = decode_logs_data(bytes(payload))
                except Exception:  # noqa: BLE001 — reject-the-request analogue
                    continue
                base = {k: rec[k] for k in names}
                rows.extend({**base, **d} for d in decoded)
            yield pd.DataFrame(rows, columns=[*names, *[f.name for f in _OL_FIELDS]])

    return df.mapInPandas(gen, out_schema)


# --- encode side (fixtures/tests only) ---------------------------------------


def _tag(fnum: int, wtype: int) -> bytes:
    return _enc_varint((fnum << 3) | wtype)


def _enc_varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _enc_varint(len(payload)) + payload


def enc_any(v) -> bytes:
    if isinstance(v, bool):
        return _tag(2, 0) + _enc_varint(1 if v else 0)
    if isinstance(v, str):
        return _ld(1, v.encode("utf-8"))
    if isinstance(v, int):
        return _tag(3, 0) + _enc_varint(v)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    if isinstance(v, bytes):
        return _ld(7, v)
    if isinstance(v, list):
        return _ld(5, b"".join(_ld(1, enc_any(x)) for x in v))
    if isinstance(v, dict):
        return _ld(6, b"".join(_ld(1, enc_kv(k, x)) for k, x in v.items()))
    raise TypeError(type(v))


def enc_kv(k: str, v) -> bytes:
    return _ld(1, k.encode("utf-8")) + _ld(2, enc_any(v))


def enc_log_record(
    ts_ns: int,
    body,
    severity_number: int = 0,
    severity_text: str | None = None,
    attrs: dict | None = None,
    trace_id: bytes | None = None,
    span_id: bytes | None = None,
) -> bytes:
    out = _tag(1, 1) + struct.pack("<Q", ts_ns)
    if severity_number:
        out += _tag(2, 0) + _enc_varint(severity_number)
    if severity_text is not None:
        out += _ld(3, severity_text.encode("utf-8"))
    out += _ld(5, enc_any(body))
    for k, v in (attrs or {}).items():
        out += _ld(6, enc_kv(k, v))
    if trace_id:
        out += _ld(9, trace_id)
    if span_id:
        out += _ld(10, span_id)
    return out


def enc_logs_data(
    records: list[bytes], resource_attrs: dict | None = None, scope_name: str | None = None
) -> bytes:
    resource = b"".join(_ld(1, enc_kv(k, v)) for k, v in (resource_attrs or {}).items())
    scope = _ld(1, scope_name.encode("utf-8")) if scope_name else b""
    scope_logs = _ld(1, scope) + b"".join(_ld(2, r) for r in records)
    resource_logs = _ld(1, resource) + _ld(2, scope_logs)
    return _ld(1, resource_logs)


def synthesize_otlp_pb(df: DataFrame, id_col: str = "event_id", cols: dict | None = None) -> DataFrame:
    """Deterministic per-row OTLP-protobuf payloads: two LogRecords per
    payload (INFO string body + ERROR kvlist body with int/double/bool
    attr types), resource + scope context, trace/span ids derived from the
    id. `cols` maps attribute keys to input columns."""
    cols = cols or {}
    keys = sorted(cols)
    in_cols = [id_col, *[cols[k] for k in keys]]

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series, *vals: pd.Series) -> pd.Series:
        out = []
        for j, i in enumerate(ids):
            i = int(i)
            attrs = {k: vals[n].iloc[j] for n, k in enumerate(keys)}
            attrs = {
                k: (int(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v)
                for k, v in attrs.items()
            }
            ts = (1_700_000_000 + i % 86400) * 1_000_000_000 + (i % 1000) * 1_000_000
            r1 = enc_log_record(
                ts, f"started job {i}", 9, "INFO", attrs,
                trace_id=i.to_bytes(16, "big"), span_id=(i % 65536).to_bytes(8, "big"),
            )
            r2 = enc_log_record(
                ts + 1_000_000, {"msg": f"fail {i}", "code": i % 7, "fatal": i % 2 == 0},
                17, "ERROR", {"retry": True, "ratio": 0.5},
            )
            out.append(enc_logs_data([r1, r2], {"service.name": f"svc-{i % 4}"}, "lib"))
        return pd.Series(out)

    return df.withColumn("payload", gen(*[F.col(c) for c in in_cols]))
