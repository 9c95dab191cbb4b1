"""Prometheus relabel_config engine — the scrape-side label rewriting the
collector's ``receiver/prometheusreceiver`` applies through the embedded
Prometheus config (README.md:91-105 "Service discovery and relabeling
behave like Prometheus", alert_config.relabel_configs README.md:39).

Semantics follow the public Prometheus relabeling contract
(prometheus/model/relabel): each rule reads ``source_labels`` joined by
``separator`` (missing label → ""), full-matches ``regex`` (patterns are
anchored ``^(?:re)$``), and then by ``action``:

  - ``replace``      match → set ``target_label`` to ``replacement`` with
                     ``$1``/``${1}`` group refs expanded; empty expansion
                     deletes the label; no match → no-op
  - ``keep``/``drop``          keep/drop the whole series on match
  - ``keepequal``/``dropequal`` compare the joined source value to the
                     current value of ``target_label``
  - ``lowercase``/``uppercase`` set ``target_label`` to the cased value
  - ``hashmod``      set ``target_label`` to
                     ``uint64_be(md5(val)[8:16]) % modulus``
  - ``labelmap``     every label NAME matching regex gains a copy under
                     the expanded replacement name (last write wins)
  - ``labeldrop``/``labelkeep`` filter label names by regex

Everything compiles to native map/regex Column expressions at plan-build
time — one whole-stage-codegen projection per chain, zero Python in the
hot path, so a 10^12-row scrape stream relabels at scan speed with no
shuffle. Labels ride in a ``map<string,string>`` column.

Replacement strings support RE2-style ``$1``/``${1}`` group references
(translated to Java's ``$1``); a literal ``$`` in a replacement is not
supported (document-level limitation, as in Java's Matcher).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULTS = {
    "action": "replace",
    "separator": ";",
    "regex": "(.*)",
    "replacement": "$1",
}


def _anchor(regex: str) -> str:
    return "^(?:" + regex + ")$"


def _java_repl(repl: str) -> str:
    """RE2 ``${1}`` → Java ``$1`` (plain ``$1`` passes through)."""
    return re.sub(r"\$\{(\d+)\}", r"$\1", repl)


def _joined(labels: Column, source_labels: list[str], sep: str) -> Column:
    """Prometheus joins source label values with separator; a label that
    is absent contributes the empty string."""
    if not source_labels:
        return F.lit("")
    return F.concat_ws(
        sep, *[F.coalesce(F.element_at(labels, F.lit(s)), F.lit("")) for s in source_labels]
    )


def _expand(val: Column, anchored: str, template: str) -> Column:
    """Full-match group expansion: the template with $n refs substituted.
    Callers gate on the match, so replacing the (single, full-string)
    match IS the expansion."""
    return F.regexp_replace(val, anchored, _java_repl(template))


def _set_label(labels: Column, name: Column, value: Column) -> Column:
    """lbls.Set(name, value): delete any existing entry, then insert —
    unless the value is empty, which is Prometheus's delete."""
    cleared = F.map_filter(labels, lambda k, _v: k != name)
    return F.when(value == "", cleared).otherwise(
        F.map_concat(cleared, F.map_from_arrays(F.array(name), F.array(value)))
    )


def _hashmod(val: Column, modulus: int) -> Column:
    """uint64 big-endian of md5 bytes [8:16), mod modulus — computed in
    DECIMAL(38,0) so the unsigned 64-bit value never wraps."""
    hi = F.conv(F.substring(F.md5(val), 17, 8), 16, 10).cast("decimal(38,0)")
    lo = F.conv(F.substring(F.md5(val), 25, 8), 16, 10).cast("decimal(38,0)")
    v = hi * F.lit(4294967296).cast("decimal(38,0)") + lo
    return F.pmod(v, F.lit(modulus).cast("decimal(38,0)")).cast("bigint").cast("string")


def relabel(df: DataFrame, rules: list[dict], labels_col: str = "labels") -> DataFrame:
    """Apply a relabel_configs chain to ``labels_col``.

    Each rule is a dict with Prometheus's keys (``action``,
    ``source_labels``, ``separator``, ``regex``, ``target_label``,
    ``replacement``, ``modulus``); omitted keys take Prometheus's
    defaults. keep/drop/keepequal/dropequal filter rows; every other
    action rewrites the label map in place.
    """
    labels = F.col(labels_col)
    for raw in rules:
        rule = {**_DEFAULTS, **raw}
        action = rule["action"]
        anchored = _anchor(rule["regex"])
        srcs = rule.get("source_labels", [])
        val = _joined(labels, srcs, rule["separator"])

        if action in ("keep", "drop"):
            matched = val.rlike(anchored)
            df = df.filter(matched if action == "keep" else ~matched)
        elif action in ("keepequal", "dropequal"):
            tgt_val = F.coalesce(F.element_at(labels, F.lit(rule["target_label"])), F.lit(""))
            eq = val == tgt_val
            df = df.filter(eq if action == "keepequal" else ~eq)
        elif action == "replace":
            matched = val.rlike(anchored)
            name = _expand(val, anchored, rule["target_label"])
            newval = _expand(val, anchored, rule["replacement"])
            df = df.withColumn(
                labels_col,
                F.when(matched, _set_label(labels, name, newval)).otherwise(labels),
            )
        elif action in ("lowercase", "uppercase"):
            cased = F.lower(val) if action == "lowercase" else F.upper(val)
            df = df.withColumn(
                labels_col, _set_label(labels, F.lit(rule["target_label"]), cased)
            )
        elif action == "hashmod":
            df = df.withColumn(
                labels_col,
                _set_label(
                    labels, F.lit(rule["target_label"]), _hashmod(val, int(rule["modulus"]))
                ),
            )
        elif action == "labelmap":
            repl = _java_repl(rule["replacement"])
            renamed = F.transform(
                F.filter(F.map_entries(labels), lambda e: e["key"].rlike(anchored)),
                lambda e: F.struct(
                    F.regexp_replace(e["key"], anchored, repl).alias("key"),
                    e["value"].alias("value"),
                ),
            )
            # fold Set() over the renamed entries: last write wins without
            # relying on the session's mapKeyDedupPolicy
            df = df.withColumn(
                labels_col,
                F.aggregate(
                    renamed,
                    labels,
                    lambda acc, e: F.map_concat(
                        F.map_filter(acc, lambda k, _v: k != e["key"]),
                        F.map_from_arrays(F.array(e["key"]), F.array(e["value"])),
                    ),
                ),
            )
        elif action in ("labeldrop", "labelkeep"):
            if action == "labeldrop":
                kept = F.map_filter(labels, lambda k, _v: ~k.rlike(anchored))
            else:
                kept = F.map_filter(labels, lambda k, _v: k.rlike(anchored))
            df = df.withColumn(labels_col, kept)
        else:
            raise ValueError(f"unknown relabel action: {action}")
    return df


def labels_csv(labels: Column) -> Column:
    """Canonical sorted ``k=v`` CSV of a label map (cross-engine hash key)."""
    return F.concat_ws(
        ",",
        F.array_sort(
            F.transform(F.map_entries(labels), lambda e: F.concat(e["key"], F.lit("="), e["value"]))
        ),
    )
