"""Per-trace span-tree operators (coralogixprocessor analogue).

The reference's coralogixprocessor (processor/coralogixprocessor/span.go:42)
groups spans by trace id, builds a parent/child tree
(internal/traceutil/tree.go:24) and applies two features:

* transactions (internal/transactions/trasactions.go:23) — pick the
  transaction root span, stamp the root's name on every span reachable from
  it, opening a NEW transaction at server/consumer-kind spans;
* critical path (internal/criticalpath/critical_path.go:38) — the CRISP-style
  end-to-end latency walk: sanitize child intervals to their parent, descend
  through the last-finishing child, and attribute exclusive/inclusive
  critical-path nanoseconds to each span.

Both are path-dependent tree walks, so they need per-trace imperative logic.
Spark shape: ONE hash repartition on the trace key + sortWithinPartitions
(traces contiguous), then `mapInPandas` — one Arrow-batched Python call per
PARTITION, not per trace. A per-group applyInPandas pays ~0.5 ms of
call/Arrow overhead per trace, which at 10⁶ small traces per executor is the
bottleneck; the partition kernel amortizes that to ~zero while streaming
batches, buffering only the one trace that may straddle an Arrow batch
boundary. Per-trace work is index-based (integer arrays, no per-span dicts)
and O(spans·log spans). Trace sizes bound memory exactly like groupbytrace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# per-trace tree construction (tree.go:24 BuildTraceTree), index-based
# ---------------------------------------------------------------------------


def _build_tree(ids, parents):
    """Returns (parent_idx, children, roots, has_parent_id) over row indices.
    A span whose parent id is empty/None, absent from the trace, or itself
    becomes a root (tree.go:37-44)."""
    idx = {}
    for i, sid in enumerate(ids):
        idx[sid] = i
    n = len(ids)
    parent_idx = [-1] * n
    children = [[] for _ in range(n)]
    roots = []
    has_parent_id = [False] * n
    for i in range(n):
        p = parents[i]
        if p is None or p == "":
            roots.append(i)
            continue
        has_parent_id[i] = True
        j = idx.get(p, -1)
        if j < 0 or j == i:
            roots.append(i)
            continue
        parent_idx[i] = j
        children[j].append(i)
    return parent_idx, children, roots, has_parent_id


# ---------------------------------------------------------------------------
# transactions (trasactions.go, span_tree.go)
# ---------------------------------------------------------------------------


def _transactions_trace(ids, parents, names, kinds, starts, tx, is_root, base):
    """Fill tx/is_root output slices for one trace (rows base..base+n)."""
    n = len(ids)
    if n == 0:
        return
    _, children, roots, has_parent_id = _build_tree(ids, parents)

    # span_tree.go:35 selectTransactionRoot: prefer an explicit root (empty
    # parent id); ties by earliest start then smallest span id string.
    explicit = fallback = -1
    for r in roots:
        if fallback < 0 or (starts[r], ids[r]) < (starts[fallback], ids[fallback]):
            fallback = r
        if not has_parent_id[r] and (
            explicit < 0 or (starts[r], ids[r]) < (starts[explicit], ids[explicit])
        ):
            explicit = r
    root = explicit if explicit >= 0 else fallback
    if root < 0:
        return

    # trasactions.go:46 applyTransactionToTrace, iterative DFS: server/
    # consumer-kind children open a new transaction.
    tx[base + root] = names[root]
    is_root[base + root] = True
    stack = [(root, names[root])]
    while stack:
        node, current = stack.pop()
        for c in children[node]:
            if kinds[c] in ("server", "consumer"):
                tx[base + c] = names[c]
                is_root[base + c] = True
                stack.append((c, names[c]))
            else:
                tx[base + c] = current
                stack.append((c, current))


# ---------------------------------------------------------------------------
# critical path (critical_path.go)
# ---------------------------------------------------------------------------


def _critical_path_trace(ids, parents, starts, ends, on_path, excl_out, incl_out, base):
    """Fill on_path/exclusive/inclusive output slices for one trace."""
    n = len(ids)
    if n == 0:
        return
    starts = list(starts)  # sanitize mutates intervals
    ends = list(ends)
    parent_idx, children, roots, _ = _build_tree(ids, parents)

    # critical_path.go:200 sanitizeOverflowingChildren: drop children disjoint
    # from their parent (subtree unreachable), clip overlapping children.
    for r in roots:
        stack = [r]
        while stack:
            p = stack.pop()
            kept = []
            for c in children[p]:
                if starts[c] >= ends[p] or ends[c] <= starts[p]:
                    parent_idx[c] = -1
                    continue
                if starts[c] < starts[p]:
                    starts[c] = starts[p]
                if ends[c] > ends[p]:
                    ends[c] = ends[p]
                kept.append(c)
                stack.append(c)
            children[p] = kept

    # Valid children end-desc-sorted with an advancing cursor. The Go walk
    # re-scans every child on each return to the parent — O(n²) on a flat
    # trace; every return here carries a strictly smaller section end (the
    # next descended child must finish before the previous one started), so
    # the cursor never rewinds and the walk is O(n log n) per trace.
    sorted_children = [None] * n
    cursor = [0] * n

    def last_finishing_child(node, rcs):
        sc = sorted_children[node]
        if sc is None:
            sc = sorted(
                (c for c in children[node] if ends[c] > starts[c]),
                key=lambda c: (ends[c], starts[c], ids[c]),
                reverse=True,
            )
            sorted_children[node] = sc
        i = cursor[node]
        if rcs is not None:
            while i < len(sc) and ends[sc[i]] >= rcs:
                i += 1
            cursor[node] = i
        return sc[i] if i < len(sc) else -1

    exclusive = [0] * n
    roots.sort(key=lambda r: (ends[r], starts[r], ids[r]), reverse=True)
    for r in roots:
        # critical_path.go:90 computeCriticalPathSections — the Go version is
        # a linear recursion (one tail call per frame); unrolled to a loop so
        # 4096-deep chains can't blow the Python stack.
        if ends[r] <= starts[r]:
            continue
        current, rcs = r, None
        while True:
            lfc = last_finishing_child(current, rcs)
            section_end = ends[current] if rcs is None else rcs
            if lfc >= 0:
                if ends[lfc] < section_end:
                    exclusive[current] += section_end - ends[lfc]
                current, rcs = lfc, None
                continue
            if starts[current] < section_end:
                exclusive[current] += section_end - starts[current]
            if parent_idx[current] >= 0:
                rcs = starts[current]
                current = parent_idx[current]
                continue
            break

    # critical_path.go:156 inclusive = exclusive + Σ children inclusive,
    # post-order over each reachable subtree (iterative).
    inclusive = [0] * n
    for r in roots:
        order, stack = [], [r]
        while stack:
            v = stack.pop()
            order.append(v)
            stack.extend(children[v])
        for v in reversed(order):
            inc = exclusive[v]
            for c in children[v]:
                inc += inclusive[c]
            inclusive[v] = inc
        # critical_path.go:259 annotateSpans: only inclusive>0 gets attrs
        for v in order:
            if inclusive[v] > 0:
                on_path[base + v] = True
                excl_out[base + v] = exclusive[v]
                incl_out[base + v] = inclusive[v]


# ---------------------------------------------------------------------------
# partition kernel: contiguous traces → per-trace slices
# ---------------------------------------------------------------------------


def _process_frame(pdf, trace_col, features):
    import numpy as np

    n = len(pdf)
    tids = pdf[trace_col].to_numpy()
    ids = pdf["span_id"].tolist()
    parents = pdf["parent_span_id"].tolist()
    starts = pdf["start_ns"].tolist()
    ends = pdf["end_ns"].tolist()
    do_tx = "transactions" in features
    do_cp = "critical_path" in features
    if do_tx:
        names = pdf["name"].tolist()
        kinds = pdf["kind"].tolist()
        tx = np.full(n, None, dtype=object)
        is_root = np.full(n, None, dtype=object)
    if do_cp:
        on_path = np.full(n, None, dtype=object)
        excl = np.full(n, None, dtype=object)
        incl = np.full(n, None, dtype=object)

    # contiguous run boundaries (input is sorted by trace within partition)
    bounds = [0] + (np.flatnonzero(tids[1:] != tids[:-1]) + 1).tolist() + [n]
    for k in range(len(bounds) - 1):
        lo, hi = bounds[k], bounds[k + 1]
        if do_tx:
            _transactions_trace(
                ids[lo:hi], parents[lo:hi], names[lo:hi], kinds[lo:hi],
                starts[lo:hi], tx, is_root, lo,
            )
        if do_cp:
            _critical_path_trace(
                ids[lo:hi], parents[lo:hi], starts[lo:hi], ends[lo:hi],
                on_path, excl, incl, lo,
            )
    out = pdf
    if do_tx:
        out = out.assign(transaction=tx, transaction_root=is_root)
    if do_cp:
        out = out.assign(on_path=on_path, exclusive_ns=excl, inclusive_ns=incl)
    return out


def _partition_kernel(trace_col, features):
    """mapInPandas generator: processes complete traces per Arrow batch,
    buffering the (single) trace that may straddle a batch boundary."""

    def gen(batches):
        import pandas as pd

        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if len(pdf) == 0:
                continue
            tids = pdf[trace_col].to_numpy()
            last = tids[-1]
            i = len(tids)
            while i > 0 and tids[i - 1] == last:
                i -= 1
            if i == 0:
                buf = pdf  # whole batch is one trace — keep buffering
                continue
            buf = pdf.iloc[i:].reset_index(drop=True)
            yield _process_frame(pdf.iloc[:i].reset_index(drop=True), trace_col, features)
        if buf is not None and len(buf):
            yield _process_frame(buf, trace_col, features)

    return gen


_TX_COLS = ", transaction string, transaction_root boolean"
_CP_COLS = ", on_path boolean, exclusive_ns bigint, inclusive_ns bigint"


def _run(df: DataFrame, trace_col: str, features: tuple, extra_schema: str) -> DataFrame:
    schema = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    shaped = df.repartition(F.col(trace_col)).sortWithinPartitions(trace_col)
    return shaped.mapInPandas(_partition_kernel(trace_col, features), schema + extra_schema)


def transaction_attributes(df: DataFrame, trace_col: str = "trace_id") -> DataFrame:
    """coralogix transactions feature.

    Input needs columns (trace_col, span_id, parent_span_id, name, kind,
    start_ns, end_ns). Output = input + `transaction` (string, null for
    spans not reachable from the selected root — orphan subtrees get no
    attribute, matching the reference which only walks the selected root)
    and `transaction_root` (true on transaction roots, null elsewhere)."""
    return _run(df, trace_col, ("transactions",), _TX_COLS)


def critical_path(df: DataFrame, trace_col: str = "trace_id") -> DataFrame:
    """CRISP critical-path attribution per trace.

    Output = input + on_path (true / null), exclusive_ns, inclusive_ns
    (nanoseconds on the critical path owned directly / including
    descendants; null when the span never touches the path, mirroring
    attribute absence in the reference)."""
    return _run(df, trace_col, ("critical_path",), _CP_COLS)


def transactions_and_critical_path(df: DataFrame, trace_col: str = "trace_id") -> DataFrame:
    """Both features in ONE pass (span.go:51's combined branch):
    a single repartition on trace_id instead of two."""
    return _run(df, trace_col, ("transactions", "critical_path"), _TX_COLS + _CP_COLS)
