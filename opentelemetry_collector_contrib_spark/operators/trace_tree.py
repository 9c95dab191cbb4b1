"""Per-trace span-tree operators (coralogixprocessor analogue).

The reference's coralogixprocessor (processor/coralogixprocessor/span.go:42)
groups spans by trace id, builds a parent/child tree
(internal/traceutil/tree.go:24) and applies two features:

* transactions (internal/transactions/trasactions.go:23) — pick the
  transaction root span, stamp `cgx.transaction` = root name on every span
  reachable from it, opening a NEW transaction at server/consumer-kind spans;
* critical path (internal/criticalpath/critical_path.go:38) — the CRISP-style
  end-to-end latency walk: sanitize child intervals to their parent, descend
  through the last-finishing child, and attribute exclusive/inclusive
  critical-path nanoseconds to each span.

Both are path-dependent tree walks, so the Spark shape is the same as
groupbytrace/tail-sampling: ONE shuffle on the trace key, then an
Arrow-batched `applyInPandas` kernel per trace group. Trace sizes are bounded
(the reference holds whole traces in memory too — groupbytrace's num_traces
bound), so per-group Python is O(trace), never O(table). At 100 TB the plan
is a single hash partitioning on trace_id; no driver collect, no cross-trace
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSACTION_ATTR = "transaction"
TRANSACTION_ROOT_ATTR = "transaction_root"


def _build_nodes(pdf):
    """tree.go:24 BuildTraceTree over one trace's pandas frame.

    Returns (nodes, roots) where nodes maps span_id -> dict with
    start/end/parent/children/name/kind/row-index. Roots are spans whose
    parent id is empty/None or absent from the trace.
    """
    nodes: dict = {}
    for i in range(len(pdf)):
        sid = pdf["span_id"].iat[i]
        nodes[sid] = {
            "id": sid,
            "start": int(pdf["start_ns"].iat[i]),
            "end": int(pdf["end_ns"].iat[i]),
            "parent": None,
            "children": [],
            "name": pdf["name"].iat[i],
            "kind": pdf["kind"].iat[i],
            "row": i,
        }
    roots = []
    for i in range(len(pdf)):
        sid = pdf["span_id"].iat[i]
        pid = pdf["parent_span_id"].iat[i]
        node = nodes[sid]
        if pid is None or pid == "" or pid not in nodes or pid == sid:
            roots.append(node)
            continue
        parent = nodes[pid]
        node["parent"] = parent
        parent["children"].append(node)
    return nodes, roots


def _better_root(current, candidate) -> bool:
    """span_tree.go:54 isBetterTransactionRoot: earlier start, then smaller id."""
    if candidate["start"] != current["start"]:
        return candidate["start"] < current["start"]
    return candidate["id"] < current["id"]


def _select_transaction_root(pdf, roots):
    """span_tree.go:35 selectTransactionRoot: prefer an explicit root (empty
    parent id), else the best orphan; ties by start then span id."""
    explicit = None
    fallback = None
    has_parent_id = {}
    for i in range(len(pdf)):
        pid = pdf["parent_span_id"].iat[i]
        has_parent_id[pdf["span_id"].iat[i]] = pid is not None and pid != ""
    for root in roots:
        if fallback is None or _better_root(fallback, root):
            fallback = root
        if not has_parent_id[root["id"]] and (explicit is None or _better_root(explicit, root)):
            explicit = root
    return explicit if explicit is not None else fallback


def _apply_transactions(pdf):
    """trasactions.go:46 applyTransactionToTrace, iteratively: DFS from the
    selected root; server/consumer-kind children open a new transaction."""
    import numpy as np

    tx = np.full(len(pdf), None, dtype=object)
    is_root = np.full(len(pdf), None, dtype=object)
    if len(pdf) == 0:
        return tx, is_root
    _, roots = _build_nodes(pdf)
    if not roots:
        return tx, is_root
    root = _select_transaction_root(pdf, roots)
    tx[root["row"]] = root["name"]
    is_root[root["row"]] = True
    stack = [(root, root["name"])]
    while stack:
        node, current_tx = stack.pop()
        for child in node["children"]:
            if child["kind"] in ("server", "consumer"):
                tx[child["row"]] = child["name"]
                is_root[child["row"]] = True
                stack.append((child, child["name"]))
            else:
                tx[child["row"]] = current_tx
                stack.append((child, current_tx))
    return tx, is_root


def transaction_attributes(
    df: DataFrame,
    trace_col: str = "trace_id",
) -> DataFrame:
    """coralogix transactions feature as a per-trace grouped kernel.

    Input needs columns (trace_col, span_id, parent_span_id, name, kind,
    start_ns, end_ns). Output = input + `transaction` (string, null for spans
    not reachable from the selected root — orphan subtrees get no attribute,
    matching the reference which only walks the selected root) and
    `transaction_root` (true on transaction roots, null elsewhere —
    the reference stamps the attribute only on roots).
    """
    import pandas as pd  # noqa: F401  (kernel runs on executors)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", transaction string, transaction_root boolean"

    def kernel(pdf):
        tx, is_root = _apply_transactions(pdf)
        pdf = pdf.copy()
        pdf["transaction"] = tx
        pdf["transaction_root"] = is_root
        return pdf

    return df.groupBy(trace_col).applyInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# critical path (CRISP walk) — critical_path.go
# ---------------------------------------------------------------------------


def _sanitize(nodes, roots):
    """critical_path.go:200 sanitizeOverflowingChildren: drop children disjoint
    from their parent (whole subtree becomes unreachable), clip overlapping
    children to the parent's interval."""
    for root in roots:
        stack = [root]
        while stack:
            parent = stack.pop()
            kept = []
            for child in parent["children"]:
                if child["start"] >= parent["end"] or child["end"] <= parent["start"]:
                    child["parent"] = None  # dropped: subtree unreachable
                    continue
                if child["start"] < parent["start"]:
                    child["start"] = parent["start"]
                if child["end"] > parent["end"]:
                    child["end"] = parent["end"]
                kept.append(child)
                stack.append(child)
            parent["children"] = kept


def _last_finishing_child(node, rcs):
    """critical_path.go:132 findLastFinishingChild: max (end, start, span id)
    among valid children, optionally only those ending before `rcs`.

    The Go walk re-scans every child on each return to the parent — O(n²) on
    a flat trace with n children. Here each node keeps its valid children
    sorted by (end, start, id) desc with an advancing cursor: every return to
    a node carries a strictly smaller `rcs` (the next descended child must
    end before the previous one started), so the cursor never rewinds and the
    whole walk is O(n log n) per trace. Same selection, scale-safe on
    10⁵-span flat traces.
    """
    if "sc" not in node:
        node["sc"] = sorted(
            (c for c in node["children"] if c["end"] > c["start"]),
            key=lambda c: (c["end"], c["start"], c["id"]),
            reverse=True,
        )
        node["cur"] = 0
    sc, i = node["sc"], node["cur"]
    if rcs is not None:
        while i < len(sc) and sc[i]["end"] >= rcs:
            i += 1
        node["cur"] = i
    return sc[i] if i < len(sc) else None


def _walk_critical_path(root, sections):
    """critical_path.go:90 computeCriticalPathSections. The Go version is a
    linear recursion (one tail call per frame); unrolled to a loop so deep
    traces can't blow the Python stack."""
    if root["end"] <= root["start"]:
        return
    current, rcs = root, None
    while current is not None:
        lfc = _last_finishing_child(current, rcs)
        section_end = current["end"] if rcs is None else rcs
        if lfc is not None:
            if lfc["end"] < section_end:
                sections.append((current["id"], lfc["end"], section_end))
            current, rcs = lfc, None
            continue
        if current["start"] < section_end:
            sections.append((current["id"], current["start"], section_end))
        if current["parent"] is not None:
            rcs = current["start"]
            current = current["parent"]
            continue
        return


def _critical_path_kernel(pdf):
    """One trace: sanitize, walk every root (end-desc order), accumulate
    exclusive sections, then post-order inclusive sums (critical_path.go:156)."""
    import numpy as np

    on_path = np.full(len(pdf), None, dtype=object)
    excl_out = np.full(len(pdf), None, dtype=object)
    incl_out = np.full(len(pdf), None, dtype=object)
    pdf = pdf.copy()
    if len(pdf) == 0:
        pdf["on_path"], pdf["exclusive_ns"], pdf["inclusive_ns"] = on_path, excl_out, incl_out
        return pdf

    nodes, roots = _build_nodes(pdf)
    _sanitize(nodes, roots)
    roots.sort(key=lambda n: (n["end"], n["start"], n["id"]), reverse=True)
    sections: list = []
    for root in roots:
        _walk_critical_path(root, sections)

    exclusive: dict = {}
    for sid, s, e in sections:
        if e > s:
            exclusive[sid] = exclusive.get(sid, 0) + (e - s)

    inclusive: dict = {}
    for root in roots:
        # post-order: children before parent
        order, stack = [], [root]
        while stack:
            n = stack.pop()
            order.append(n)
            stack.extend(n["children"])
        for n in reversed(order):
            inclusive[n["id"]] = exclusive.get(n["id"], 0) + sum(
                inclusive[c["id"]] for c in n["children"]
            )

    for sid, node in nodes.items():
        inc = inclusive.get(sid, 0)
        if inc > 0:  # critical_path.go:259 annotateSpans: inclusive>0 only
            on_path[node["row"]] = True
            excl_out[node["row"]] = exclusive.get(sid, 0)
            incl_out[node["row"]] = inc
    pdf["on_path"], pdf["exclusive_ns"], pdf["inclusive_ns"] = on_path, excl_out, incl_out
    return pdf


def critical_path(df: DataFrame, trace_col: str = "trace_id") -> DataFrame:
    """CRISP critical-path attribution per trace.

    Input needs (trace_col, span_id, parent_span_id, name, kind, start_ns,
    end_ns). Output = input + on_path (true / null), exclusive_ns,
    inclusive_ns (nanoseconds on the critical path owned directly /
    including descendants; null when the span never touches the path,
    mirroring attribute absence in the reference).
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", on_path boolean, exclusive_ns bigint, inclusive_ns bigint"
    return df.groupBy(trace_col).applyInPandas(_critical_path_kernel, schema=out_schema)


def transactions_and_critical_path(df: DataFrame, trace_col: str = "trace_id") -> DataFrame:
    """Both features in ONE grouped pass (span.go:51's combined branch):
    a single shuffle on trace_id instead of two."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + (
        ", transaction string, transaction_root boolean"
        ", on_path boolean, exclusive_ns bigint, inclusive_ns bigint"
    )

    def kernel(pdf):
        tx, is_root = _apply_transactions(pdf)
        out = _critical_path_kernel(pdf)
        out["transaction"], out["transaction_root"] = tx, is_root
        # column order must match the declared schema
        cols = [c for c in out.columns if c not in ("transaction", "transaction_root", "on_path", "exclusive_ns", "inclusive_ns")]
        return out[cols + ["transaction", "transaction_root", "on_path", "exclusive_ns", "inclusive_ns"]]

    return df.groupBy(trace_col).applyInPandas(kernel, schema=out_schema)
