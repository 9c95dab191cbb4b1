"""Collector-YAML compatibility shim: parse a collector-shaped YAML config
(receivers / processors / connectors / service.pipelines — the confmap
surface, SURVEY.md §3.1) into the plans/config.py spec dict, so a user can
bring the config they run the reference with.

Translated components (the log-pipeline core this engine implements):
  receivers.filelog.include                 → source.path
  processors.transform.log_statements       → transform (OTTL statements,
                                              contexts resolve via the
                                              priority inferrer)
  processors.filter.logs.log_record         → filter (OTTL drop conditions)
  processors.probabilistic_sampler          → sample (portable hash policy,
                                              sampling_percentage semantics)
  processors.tail_sampling.policies         → tail_sampling (policy configs
                                              use the reference's nested
                                              shape: latency.threshold_ms,
                                              string_attribute.{key,values},
                                              status_code.status_codes,
                                              probabilistic.sampling_percentage,
                                              and/or/drop.{and,or,drop}_sub_policy)
  connectors.routing.{table,default_pipelines} → routes (sink name = the
                                              pipeline id after '/')

Unknown top-level components raise, mirroring confmap's strict unmarshal;
component configs we cannot express raise with the reason rather than
silently dropping semantics.
"""

from __future__ import annotations

from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - baked into this environment
    yaml = None

_SUPPORTED_PROCESSORS = {"transform", "filter", "probabilistic_sampler", "tail_sampling", "logstransform"}


def _pipeline_sink(pipeline_id: str) -> str:
    return pipeline_id.split("/", 1)[1] if "/" in pipeline_id else pipeline_id


def _translate_tail_policy(p: dict[str, Any]) -> dict[str, Any]:
    """Reference policy config (tailsamplingprocessor README shapes) → our
    flat policy dict (operators/recombine.py policy tree). Malformed
    configs raise ValueError (the build-time contract), never KeyError."""
    name, ptype = p.get("name"), p.get("type")
    if not isinstance(ptype, str):
        raise ValueError(f"policy {name}: type must be a string, got {type(ptype).__name__}")
    out: dict[str, Any] = {"name": name, "type": ptype}
    body = p.get(ptype, {}) or {}
    if not isinstance(body, dict):
        raise ValueError(f"policy {name}: {ptype} block must be a mapping")

    def _req(key: str):
        if key not in body:
            raise ValueError(f"policy {name} ({ptype}): missing {key}")
        return body[key]

    if ptype == "latency":
        out["threshold_ms"] = _req("threshold_ms")
    elif ptype == "numeric_attribute":
        out.update({"key": _req("key"), "min": body.get("min_value"), "max": body.get("max_value")})
    elif ptype == "string_attribute":
        out.update({"key": _req("key"), "values": _req("values")})
    elif ptype == "boolean_attribute":
        out.update({"key": _req("key"), "value": _req("value")})
    elif ptype == "status_code":
        out["values"] = _req("status_codes")
    elif ptype == "probabilistic":
        out["percent"] = _req("sampling_percentage")
    elif ptype == "span_count":
        out.update({"min": body.get("min_spans"), "max": body.get("max_spans")})
    elif ptype == "ottl_condition":
        conds = (body.get("span") or []) + (body.get("spanevent") or []) + (body.get("log") or [])
        if len(conds) != 1:
            raise ValueError(f"policy {name}: exactly one ottl condition supported, got {len(conds)}")
        out["condition"] = conds[0]
    elif ptype in ("and", "or", "drop"):
        subs = body.get(f"{ptype}_sub_policy") or body.get("sub_policy") or []
        if not isinstance(subs, list) or not all(isinstance(s, dict) for s in subs):
            raise ValueError(f"policy {name}: {ptype} sub-policies must be a list of mappings")
        out["of"] = [_translate_tail_policy(s) for s in subs]
    else:
        raise ValueError(f"policy {name}: unsupported type {ptype!r}")
    return out


def spec_from_collector_yaml(text: str, source_path: str | None = None) -> dict[str, Any]:
    """Translate collector YAML into a plans/config.py spec. `source_path`
    overrides the filelog include (the usual case in-sandbox: point the
    same config at a parquet fixture instead of /var/log)."""
    if yaml is None:
        raise RuntimeError("pyyaml is required for collector-config translation")
    cfg = yaml.safe_load(text) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"collector config must be a mapping, got {type(cfg).__name__}")
    unknown = set(cfg) - {"receivers", "processors", "exporters", "connectors", "service", "extensions"}
    if unknown:
        raise ValueError(f"unknown collector sections: {sorted(map(str, unknown))}")

    spec: dict[str, Any] = {}

    receivers = cfg.get("receivers", {}) or {}
    if not isinstance(receivers, dict):
        raise ValueError("receivers must be a mapping of name -> config")
    filelog = receivers.get("filelog") or {}
    if not isinstance(filelog, dict):
        raise ValueError("receivers.filelog must be a mapping")
    netflow = receivers.get("netflow") or {}
    if not isinstance(netflow, dict):
        raise ValueError("receivers.netflow must be a mapping")
    if source_path is not None:
        spec["source"] = {"path": source_path}
    elif "netflow" in receivers:
        # receiver/netflowreceiver config.go:40-50: scheme is netflow or
        # sflow (the netflow scheme covers both v5 and ipfix exports);
        # the UDP socket is out of scope, so `spool` points at the payload
        # table the network bridge lands packets in.
        spool = netflow.get("spool")
        if not spool:
            raise ValueError("netflow receiver needs spool (payload table path)")
        scheme = netflow.get("scheme", "netflow")
        if scheme not in ("netflow", "sflow"):
            raise ValueError("scheme must be netflow or sflow")
        if scheme == "sflow":
            wire = "sflow"
        else:
            fmt = netflow.get("format", "v5")
            if fmt not in ("v5", "v9", "ipfix"):
                raise ValueError("netflow format must be v5, v9, or ipfix")
            wire = {"v5": "netflow_v5", "v9": "netflow_v9", "ipfix": "ipfix"}[fmt]
        spec["source"] = {"wire_spool": spool, "wire": wire}
    elif "filelog" in receivers:
        include = filelog.get("include") or []
        if not include or not isinstance(include, list):
            raise ValueError("filelog receiver needs include[]")
        spec["source"] = {"path": include[0] if len(include) == 1 else include}
    else:
        raise ValueError("no supported receiver (filelog/netflow) and no source_path override")

    stanza_ops = filelog.get("operators")
    if stanza_ops:
        # the receiver's operator chain rides along; build_pipeline runs it
        # as the parse stage (plans/stanza_chain.py)
        spec["stanza_operators"] = stanza_ops

    processors = cfg.get("processors", {}) or {}
    if not isinstance(processors, dict):
        raise ValueError("processors must be a mapping of name -> config")
    for pname in processors:
        base = str(pname).split("/", 1)[0]
        if base not in _SUPPORTED_PROCESSORS:
            raise ValueError(f"unsupported processor {pname!r} (supported: {sorted(_SUPPORTED_PROCESSORS)})")

    for pname, pcfg in processors.items():
        base = str(pname).split("/", 1)[0]
        pcfg = pcfg or {}
        if not isinstance(pcfg, dict):
            raise ValueError(f"processor {pname!r}: config must be a mapping")
        if base == "transform":
            stmts: list[str] = []
            for block in pcfg.get("log_statements", []) or []:
                if isinstance(block, str):
                    stmts.append(block)
                elif isinstance(block, dict):
                    stmts.extend(block.get("statements", []) or [])
                else:
                    raise ValueError("transform.log_statements entries must be strings or mappings")
            if stmts:
                spec.setdefault("transform", []).extend(stmts)
        elif base == "filter":
            logs = pcfg.get("logs") or {}
            if not isinstance(logs, dict):
                raise ValueError("filter.logs must be a mapping")
            conds = logs.get("log_record") or []
            if conds:
                spec.setdefault("filter", []).extend(conds)
        elif base == "logstransform":
            # logstransformprocessor embeds the same stanza operators list
            # as the filelog receiver (processor/logstransformprocessor).
            # With receiver ops present they extend that parse chain; with
            # none, they run AFTER the default parse stage (replacing it
            # would drop the parsed columns the ops reference)
            ops = pcfg.get("operators") or []
            if not isinstance(ops, list):
                raise ValueError("logstransform.operators must be a list")
            if ops:
                key = "stanza_operators" if spec.get("stanza_operators") else "stanza_operators_post"
                spec.setdefault(key, []).extend(ops)
        elif base == "probabilistic_sampler":
            if pcfg.get("sampling_percentage") is None:
                raise ValueError("probabilistic_sampler needs sampling_percentage")
            spec["sample"] = {
                "kind": "probabilistic_portable",
                "key": pcfg.get("attribute_source", "conv_id") if pcfg.get("attribute_source") else "conv_id",
                "percent": pcfg["sampling_percentage"],
            }
        elif base == "tail_sampling":
            raw_policies = pcfg.get("policies", []) or []
            if not isinstance(raw_policies, list) or not all(isinstance(p, dict) for p in raw_policies):
                raise ValueError("tail_sampling.policies must be a list of mappings")
            policies = [_translate_tail_policy(p) for p in raw_policies]
            ts: dict[str, Any] = {"policies": policies}
            if pcfg.get("rate_limit_per_minute") is not None:
                ts["rate_limit_per_minute"] = pcfg["rate_limit_per_minute"]
            spec["tail_sampling"] = ts

    connectors = cfg.get("connectors", {}) or {}
    if not isinstance(connectors, dict):
        raise ValueError("connectors must be a mapping of name -> config")
    for cname, ccfg in connectors.items():
        if str(cname).split("/", 1)[0] != "routing":
            raise ValueError(f"unsupported connector {cname!r}")
        ccfg = ccfg or {}
        if not isinstance(ccfg, dict):
            raise ValueError(f"connector {cname!r}: config must be a mapping")
        table = []
        entries = ccfg.get("table", []) or []
        if not isinstance(entries, list) or not all(isinstance(e, dict) for e in entries):
            raise ValueError("routing table must be a list of mappings")
        for entry in entries:
            cond = entry.get("condition") or entry.get("statement")
            if not cond:
                raise ValueError("routing table entry needs condition")
            pipelines = entry.get("pipelines") or []
            if not isinstance(pipelines, list) or not pipelines:
                raise ValueError("routing table entry needs pipelines")
            table.append(
                {
                    "name": _pipeline_sink(str(pipelines[0])),
                    "condition": cond,
                    # reference semantics: a record matches the FIRST table
                    # entry unless match_once is disabled; copy when the
                    # entry fans to >1 pipeline
                    "mode": "copy" if len(pipelines) > 1 else "move",
                }
            )
        routes: dict[str, Any] = {"table": table}
        defaults = ccfg.get("default_pipelines") or []
        if defaults:
            if not isinstance(defaults, list):
                raise ValueError("default_pipelines must be a list")
            routes["default"] = _pipeline_sink(str(defaults[0]))
        spec["routes"] = routes

    return spec


def build_from_collector_yaml(spark, text: str, source_path: str | None = None):
    """One-call path: YAML → validated spec → routed DataFrame."""
    from .config import build_pipeline

    return build_pipeline(spark, spec_from_collector_yaml(text, source_path))
