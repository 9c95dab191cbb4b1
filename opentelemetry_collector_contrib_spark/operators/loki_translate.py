"""Loki translator, stream-label side — ``pkg/translator/loki``
(convert.go:37-149, logs_to_loki.go:123-233) as pure map/array-algebra
projections over flat ``map<string,string>`` attribute columns.

Semantics mirrored:
  - default labels: exporter="OTLP"; job = service.namespace "/"
    service.name (name alone when no namespace, nothing when no name);
    instance = service.instance.id; each individually disableable via
    ``defaults_enabled`` (absent key = enabled, matching the Go
    ``enabled, ok :=`` idiom);
  - hint labels: ``loki.resource.labels`` read from BOTH resource and
    record attributes (both select out of the *resource* map), then
    ``loki.attribute.labels`` selecting out of the record map —
    later merges win, names comma-split and trimmed;
  - level: when enabled and the record carries a severity text, a
    ``level`` record attribute is added (unless present) and joins the
    attribute-hint list (logs_to_loki.go:207-218);
  - label names pass through the Prometheus label namer (dots → ``_``,
    digit/underscore prefixes — reuse of prom_translate);
  - tenant: ``loki.tenant`` names the attribute holding the tenant;
    hint looked up resource-first then record, the value likewise
    (logs_to_loki.go:183-205);
  - format: ``loki.format`` resource-first then record, default json;
  - promoted labels and the four hint keys are removed from both
    attribute maps (convert.go:139-148); the JSON/logfmt body encode
    itself lives in ``render.render_loki_push``.

Flat-map model note: nested dotted-path map values (convert.go
getAttribute's recursive descent) collapse to flat keys in this
relational model — a flat key containing dots resolves identically.

Scale: zero shuffle — every step is HOF array algebra inside one
projection; dedup-by-key is an aggregate fold over a handful of label
entries, not a groupBy."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .prom_translate import _trimspace, prom_normalize_label

HINT_ATTRIBUTES = "loki.attribute.labels"
HINT_RESOURCES = "loki.resource.labels"
HINT_TENANT = "loki.tenant"
HINT_FORMAT = "loki.format"
_HINTS = [HINT_ATTRIBUTES, HINT_RESOURCES, HINT_TENANT, HINT_FORMAT]


def _hint_names(m: Column, hint: str) -> Column:
    """Comma-split, trimmed attribute names from a hint value ('' → [])."""
    raw = F.element_at(m, hint)
    # _trimspace, not F.trim: Go strings.TrimSpace strips tabs/newlines too
    return F.when(
        raw.isNotNull(),
        F.transform(F.split(raw, ","), lambda s: _trimspace(s)),
    ).otherwise(F.array().cast("array<string>"))


def _select_labels(names: Column, source: Column) -> Column:
    """(k, v) entries for every hint name present in the source map."""
    return F.filter(
        F.transform(
            names, lambda n: F.struct(n.alias("k"), F.element_at(source, n).alias("v"))
        ),
        lambda e: e["v"].isNotNull(),
    )


def loki_stream_labels(
    df: DataFrame,
    log_attrs_col: str = "log_attrs",
    res_attrs_col: str = "res_attrs",
    severity_col: str | None = None,
    defaults_enabled: dict[str, bool] | None = None,
) -> DataFrame:
    """Adds (loki_labels, loki_tenant, loki_format, log_attrs_rest,
    res_attrs_rest): the stream-label CSV is sorted ``name=value`` pairs
    after Prometheus label-name normalization; *_rest are the attribute
    maps with promoted labels and hint keys removed."""
    de = defaults_enabled or {}

    def on(key: str) -> bool:  # absent = enabled
        return de.get(key, True)

    la, ra = F.col(log_attrs_col), F.col(res_attrs_col)

    # level attribute + implicit hint (logs_to_loki.go:207-218)
    sev = F.col(severity_col) if severity_col else F.lit(None).cast("string")
    lvl_active = (
        sev.isNotNull() & (sev != "") if (severity_col and on("level")) else F.lit(False)
    )
    la_eff = F.when(
        lvl_active & ~F.array_contains(F.map_keys(la), "level"),
        F.map_concat(la, F.create_map(F.lit("level"), sev)),
    ).otherwise(la)

    defaults = []
    if on("exporter"):
        defaults.append(F.struct(F.lit("exporter").alias("k"), F.lit("OTLP").alias("v")))
    if on("job"):
        name, ns = F.element_at(ra, "service.name"), F.element_at(ra, "service.namespace")
        job = F.when(
            name.isNotNull(),
            F.when(ns.isNotNull(), F.concat(ns, F.lit("/"), name)).otherwise(name),
        )
        defaults.append(F.struct(F.lit("job").alias("k"), job.alias("v")))
    if on("instance"):
        defaults.append(
            F.struct(F.lit("instance").alias("k"), F.element_at(ra, "service.instance.id").alias("v"))
        )

    attr_names = _hint_names(la_eff, HINT_ATTRIBUTES)
    attr_names = F.when(
        lvl_active & ~F.array_contains(attr_names, "level"),
        F.concat(attr_names, F.array(F.lit("level"))),
    ).otherwise(attr_names)

    entries = F.concat(
        F.filter(F.array(*defaults) if defaults else F.array().cast(
            "array<struct<k:string,v:string>>"), lambda e: e["v"].isNotNull()),
        _select_labels(_hint_names(ra, HINT_RESOURCES), ra),
        _select_labels(_hint_names(la_eff, HINT_RESOURCES), ra),
        _select_labels(attr_names, la_eff),
    )
    staged = df.select("*", entries.alias("_lent"), la_eff.alias("_la_eff"))
    ent = F.col("_lent")
    keys = F.array_distinct(F.transform(ent, lambda e: e["k"]))
    # later-wins merge: fold the ordered entry list per distinct key
    merged = F.transform(
        keys,
        lambda k: F.struct(
            k.alias("k"),
            F.aggregate(
                ent,
                F.lit(None).cast("string"),
                lambda acc, e: F.when(e["k"] == k, e["v"]).otherwise(acc),
            ).alias("v"),
        ),
    )
    staged = staged.select("*", merged.alias("_lmerged"))
    lm = F.col("_lmerged")
    labels_csv = F.concat_ws(
        ",",
        F.array_sort(
            F.transform(lm, lambda e: F.concat(prom_normalize_label(e["k"]), F.lit("="), e["v"]))
        ),
    )
    label_keys = F.transform(lm, lambda e: e["k"])

    tenant_hint = F.coalesce(F.element_at(ra, HINT_TENANT), F.element_at(F.col("_la_eff"), HINT_TENANT))
    tenant = F.when(
        tenant_hint.isNotNull(),
        F.coalesce(
            F.element_at(ra, tenant_hint), F.element_at(F.col("_la_eff"), tenant_hint), F.lit("")
        ),
    ).otherwise(F.lit(""))
    fmt = F.coalesce(
        F.element_at(ra, HINT_FORMAT), F.element_at(F.col("_la_eff"), HINT_FORMAT), F.lit("json")
    )

    def strip(m: Column) -> Column:
        return F.map_filter(
            m,
            lambda k, _v: ~k.isin(*_HINTS) & ~F.array_contains(label_keys, k),
        )

    return staged.select(
        *df.columns,
        labels_csv.alias("loki_labels"),
        tenant.alias("loki_tenant"),
        fmt.alias("loki_format"),
        strip(F.col("_la_eff")).alias("log_attrs_rest"),
        strip(ra).alias("res_attrs_rest"),
    )
