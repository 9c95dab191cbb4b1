"""Stanza operator-chain compiler: the filelog receiver's `operators:` list
(SURVEY.md §3.2) as a config → DataFrame transformation.

The reference's filelog receiver (and logstransformprocessor) nests an
ordered list of stanza operator configs — regex_parser, json_parser,
severity/time parsers, field editors, filter, router — and wires them into
an entry-at-a-time chain (pkg/stanza/operator/config.go unmarshals by
`type`, pipeline/directed.go topologically wires outputs). Here the same
list compiles into chained DataFrame transformations: each op is one
projection/filter, so Catalyst fuses the whole chain into a single
scan-time stage — there is no per-entry interpreter loop.

Config fidelity notes:
- `parse_from`/field names accept stanza-style `body` and `attributes.x`
  / `resource.x` dotted forms; in the relational model both map to plain
  columns (`body` → the chain's body column).
- regex_parser takes the stanza `regex` with named capture groups
  `(?P<name>...)` (regex_parser README/config) and emits one column per
  group. `on_error: drop` removes non-matching entries
  (transformer.go:100-113 drop-on-error path); the default `send` keeps
  them with NULL fields.
- router `routes: [{expr, output}]` tags rows with first-match `output`
  (routingconnector-style route_id column) instead of forking the chain —
  the relational fan-out happens at the sink (operators/route.py). Route
  expressions are Spark SQL boolean expressions, not the stanza expr
  language (documented deviation; `body matches '...'` → `body rlike
  '...'`).

Cited: pkg/stanza/operator/parser/regex/config.go (regex, parse_from,
on_error), parser/severity + helper/severity_builder.go, helper/time.go
layout types, parser/{syslog,uri,trace,container,jsonarray,scope},
transformer/{add,remove,copy,move,retain,flatten,unquote,assignkeys,
regexreplace,sanitizeutf8,noop}/config.go (field/value/from/to),
transformer/filter (expr, drops matches), transformer/router/config.go
(routes, default), transformer/recombine/config.go (is_first_entry,
combine_field, source_identifier, max_batch_size — plus an explicit
`order_field`, the batch analogue of arrival order).
"""

from __future__ import annotations

import re as _re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = {
    "regex_parser", "json_parser", "csv_parser", "key_value_parser",
    "severity_parser", "time_parser", "add", "remove", "copy", "move",
    "retain", "flatten", "filter", "router",
    # full parser/transformer coverage (pkg/stanza/operator/{parser,transformer})
    "syslog_parser", "uri_parser", "trace_parser", "container",
    "jsonarray_parser", "scope_name_parser", "sanitize_utf8",
    "unquote", "assign_keys", "regex_replace", "noop", "recombine",
}

_NAMED_GROUP = _re.compile(r"\(\?P<([A-Za-z][A-Za-z0-9_]*)>")


def _field(name: str, body_col: str) -> str:
    """stanza field syntax → column name: `body` is the chain's body
    column; `attributes.x` / `resource.x` flatten to `x`."""
    if name == "body":
        return body_col
    for prefix in ("attributes.", "resource."):
        if name.startswith(prefix):
            return name[len(prefix):]
    return name


def validate_stanza_ops(ops: list[dict[str, Any]]) -> None:
    """Eager config validation, like stanza's unmarshal-by-type: unknown
    types, missing required fields, and malformed regexes fail at build."""
    for i, op in enumerate(ops):
        where = f"operators[{i}]"
        if not isinstance(op, dict):
            raise ValueError(f"{where}: operator config must be a mapping, got {type(op).__name__}")
        t = op.get("type")
        if not isinstance(t, str) or t not in _SUPPORTED:
            raise ValueError(f"{where}: unknown operator type {t!r} (supported: {sorted(_SUPPORTED)})")
        gate = op.get("if")
        if gate is not None:
            if not isinstance(gate, str) or not gate.strip():
                raise ValueError(f"{where}: `if` must be a non-empty boolean expression string")
            if t in ("router", "recombine"):
                raise ValueError(f"{where}: `if` is not supported on {t} (fork/stateful operators)")
        if t == "regex_parser":
            rx = op.get("regex")
            if not rx or not isinstance(rx, str):
                raise ValueError(f"{where}: regex_parser needs `regex` (a string)")
            if not _NAMED_GROUP.search(rx):
                raise ValueError(f"{where}: regex needs at least one named capture group (?P<name>...)")
            try:
                _re.compile(rx)  # malformed regex fails eagerly, as ValueError
            except _re.error as e:
                raise ValueError(f"{where}: malformed regex: {e}") from e
            if op.get("on_error", "send") not in ("send", "drop"):
                raise ValueError(f"{where}: on_error must be send|drop")
        elif t == "csv_parser" and not op.get("header"):
            raise ValueError(f"{where}: csv_parser needs `header`")
        elif t == "time_parser" and not op.get("layout"):
            raise ValueError(f"{where}: time_parser needs `layout`")
        elif t == "add" and not op.get("field"):
            raise ValueError(f"{where}: add needs `field`")
        elif t == "remove" and not op.get("field"):
            raise ValueError(f"{where}: remove needs `field`")
        elif t in ("copy", "move") and not (op.get("from") and op.get("to")):
            raise ValueError(f"{where}: {t} needs `from` and `to`")
        elif t == "retain" and not op.get("fields"):
            raise ValueError(f"{where}: retain needs `fields`")
        elif t == "flatten" and not op.get("field"):
            raise ValueError(f"{where}: flatten needs `field`")
        elif t == "filter" and not op.get("expr"):
            raise ValueError(f"{where}: filter needs `expr`")
        elif t == "syslog_parser" and op.get("protocol", "rfc5424") not in ("rfc5424", "rfc3164"):
            raise ValueError(f"{where}: syslog protocol must be rfc5424|rfc3164")
        elif t == "assign_keys" and not (op.get("keys") and op.get("field")):
            raise ValueError(f"{where}: assign_keys needs `field` and `keys`")
        elif t == "unquote" and not op.get("field"):
            raise ValueError(f"{where}: unquote needs `field`")
        elif t == "regex_replace" and not (op.get("regex") is not None and op.get("replace_with") is not None):
            raise ValueError(f"{where}: regex_replace needs `regex` and `replace_with`")
        elif t == "recombine":
            if not op.get("is_first_entry"):
                raise ValueError(f"{where}: recombine needs `is_first_entry`")
            if not (op.get("source_identifier") and op.get("order_field")):
                raise ValueError(
                    f"{where}: recombine needs `source_identifier` and `order_field` "
                    "(batch analogue of arrival order)"
                )
        elif t == "router":
            routes = op.get("routes") or []
            if not routes or not isinstance(routes, list):
                raise ValueError(f"{where}: router needs a non-empty `routes` list")
            for r in routes:
                if not isinstance(r, dict) or not (r.get("expr") and r.get("output")):
                    raise ValueError(f"{where}: every route needs `expr` and `output`")


def _apply_regex_parser(df: DataFrame, op: dict, body_col: str) -> DataFrame:
    rx = op["regex"]
    # groupindex maps each NAME to its overall capture-group number — this
    # stays correct when the pattern mixes unnamed groups with named ones
    # (stripping ?P<name> does not renumber groups in the Java engine)
    group_index = _re.compile(rx).groupindex
    java_rx = _NAMED_GROUP.sub("(", rx)
    # validate_stanza_ops compiles with PYTHON semantics (no session there);
    # execution uses the JVM engine — compile Java-side too so a
    # Python-valid/Java-invalid pattern fails at build, not mid-job
    try:
        df.sparkSession._jvm.java.util.regex.Pattern.compile(java_rx)  # type: ignore[union-attr]
    except AttributeError:
        pass  # Spark Connect: no _jvm; the pattern fails at analysis instead
    except Exception as e:
        raise ValueError(f"regex_parser: pattern rejected by the Java regex engine: {e}") from e
    src = F.col(_field(op.get("parse_from", "body"), body_col))
    matched = src.rlike(java_rx)
    if op.get("on_error", "send") == "drop":
        # withColumns evaluates every expression against the pre-projection
        # frame, so a group named after the source column cannot shadow the
        # source for its sibling extracts
        return df.filter(matched).withColumns(
            {name: F.regexp_extract(src, java_rx, gi) for name, gi in group_index.items()}
        )
    # send: non-matching rows keep NULL fields (regexp_extract returns ''
    # on miss, so gate each group on the match)
    return df.withColumns(
        {name: F.when(matched, F.regexp_extract(src, java_rx, gi)) for name, gi in group_index.items()}
    )


def apply_stanza_operators(
    df: DataFrame, ops: list[dict[str, Any]], body_col: str = "text"
) -> DataFrame:
    """Compile and apply the operator list in order. One Column expression
    per op; the chain stays inside whole-stage codegen."""
    from ..operators import transform as tr
    from ..operators.container import container_parser
    from ..operators.parse import (
        csv_parser, json_parser, jsonarray_parser, key_value_parser,
        sanitize_utf8, severity_parser, syslog_rfc3164_parser,
        syslog_rfc5424_parser, time_parser_layout, trace_parser, uri_parser,
    )
    from ..operators.recombine import recombine
    from ..operators.route import Route, RouteTable, apply_routes

    validate_stanza_ops(ops)
    for op in ops:
        t = op["type"]
        pf = _field(op.get("parse_from", "body"), body_col)
        # stanza's universal `if` gate (helper/transformer.go: every
        # transformer/parser runs only when the expression is true; other
        # entries pass through untouched). Relational form: snapshot the
        # pre-op columns, apply the op to every row, then per column pick
        # op-output where gated / original otherwise. A column the op
        # REMOVES stays present carrying its original value on ungated
        # rows (entries are maps in stanza, columns here — documented).
        # filter composes directly: drop iff gate AND expr.
        gate_sql = op.get("if")
        if gate_sql is not None and t == "filter":
            df = df.filter(
                ~(
                    F.coalesce(F.expr(gate_sql), F.lit(False))
                    & F.coalesce(F.expr(op["expr"]), F.lit(False))
                )
            )
            continue
        if gate_sql is not None:
            pre_cols = list(df.columns)
            df = df.withColumn("_gate", F.coalesce(F.expr(gate_sql), F.lit(False)))
            df = df.select("*", *[F.col(c).alias(f"_g_{c}") for c in pre_cols])
        if t == "regex_parser":
            df = _apply_regex_parser(df, op, body_col)
        elif t == "json_parser":
            # stanza's json_parser is schema-less (parses into the attr
            # map); `schema` is our optional typed extension
            schema = op.get("schema", "map<string,string>")
            df = json_parser(df, pf, schema, dest=op.get("parse_to", "parsed_json"))
        elif t == "csv_parser":
            header = op["header"]
            if isinstance(header, str):
                # stanza header is a delimiter-joined NAME string
                # (parser/csv/config.go header + header_delimiter)
                hd = op.get("header_delimiter", op.get("delimiter", ","))
                header = [h.strip() for h in header.split(hd)]
            schema = ", ".join(f"{h} string" for h in header)
            df = csv_parser(df, pf, schema, sep=op.get("delimiter", ","), dest=op.get("parse_to", "parsed_csv"))
        elif t == "key_value_parser":
            df = key_value_parser(
                df, pf, dest=op.get("parse_to", "kv"),
                pair_delim=op.get("pair_delimiter", " "), kv_delim=op.get("delimiter", "="),
            )
        elif t == "severity_parser":
            df = severity_parser(df, pf, mapping=op.get("mapping"))
        elif t == "time_parser":
            df = time_parser_layout(
                df, pf, op["layout"], layout_type=op.get("layout_type", "strptime"),
                dest=op.get("parse_to", "event_ts"), location=op.get("location"),
            )
        elif t == "add":
            df = tr.add(df, _field(op["field"], body_col), op.get("value"))
        elif t == "remove":
            df = tr.remove(df, _field(op["field"], body_col))
        elif t == "copy":
            df = tr.copy_field(df, _field(op["from"], body_col), _field(op["to"], body_col))
        elif t == "move":
            df = tr.move(df, _field(op["from"], body_col), _field(op["to"], body_col))
        elif t == "retain":
            df = tr.retain(df, [_field(f, body_col) for f in op["fields"]])
        elif t == "flatten":
            df = tr.flatten(df, _field(op["field"], body_col))
        elif t == "syslog_parser":
            parse = syslog_rfc5424_parser if op.get("protocol", "rfc5424") == "rfc5424" else syslog_rfc3164_parser
            df = parse(df, pf)
        elif t == "uri_parser":
            df = uri_parser(df, pf)
        elif t == "trace_parser":
            df = trace_parser(df, pf)
        elif t == "container":
            df = container_parser(df, pf)
        elif t == "jsonarray_parser":
            df = jsonarray_parser(df, pf, element_type=op.get("element_type", "string"), dest=op.get("parse_to", "parsed_array"))
        elif t == "scope_name_parser":
            # parser/scope: promote a field to the instrumentation scope name
            df = tr.copy_field(df, pf, "scope_name")
        elif t == "sanitize_utf8":
            df = sanitize_utf8(df, pf)
        elif t == "unquote":
            df = tr.unquote(df, _field(op["field"], body_col))
        elif t == "assign_keys":
            df = tr.assign_keys(df, _field(op["field"], body_col), op["keys"], dest=op.get("parse_to", "kv"))
        elif t == "regex_replace":
            df = tr.regex_replace(df, _field(op["field"], body_col), op["regex"], op["replace_with"])
        elif t == "noop":
            pass
        elif t == "recombine":
            df = recombine(
                df,
                _field(op["source_identifier"], body_col),
                _field(op["order_field"], body_col),
                op["is_first_entry"],
                combine_field=_field(op.get("combine_field", "body"), body_col),
                combine_with=op.get("combine_with", "\n"),
                max_batch=op.get("max_batch_size"),
            )
        elif t == "filter":
            # stanza filter DROPS entries matching expr (transformer/filter)
            df = df.filter(~F.coalesce(F.expr(op["expr"]), F.lit(False)))
        elif t == "router":
            table = RouteTable(
                routes=[Route(r["output"], F.expr(r["expr"]), r.get("mode", "move")) for r in op["routes"]],
                default=op.get("default", "general"),
            )
            df = apply_routes(df, table)
        if gate_sql is not None:
            gate = F.col("_gate")
            out_cols = [c for c in df.columns if not c.startswith("_g_") and c != "_gate"]
            combined = []
            for c in out_cols:
                if f"_g_{c}" in df.columns:
                    combined.append(F.when(gate, F.col(c)).otherwise(F.col(f"_g_{c}")).alias(c))
                else:  # column the op created: NULL on ungated rows
                    combined.append(F.when(gate, F.col(c)).alias(c))
            # columns the op removed come back carrying the original value
            # on ungated rows (NULL where the gate fired)
            for c in (set(df.columns) - set(out_cols)):
                if c.startswith("_g_") and c[3:] not in out_cols and c != "_gate":
                    combined.append(F.when(~gate, F.col(c)).alias(c[3:]))
            df = df.select(*combined)
    return df
