"""Deterministic synthetic transcript tables (FIXTURES.md §1-3).

The input_hint schema: (conv_id string, turn_idx int32, role string,
text string, tool string, ts timestamp). Conversation sizes are Zipf-skewed
(a few monster conversations exercise salting / AQE skew-join), rows are
emitted shuffled (the stable-order window has to do real work), ~1% of rows
share a ts with their predecessor (tie-break coverage), and ~2% of texts are
deliberately unparsable (the `_unparsed` / on_error path, mirroring stanza's
on_error policy in pkg/stanza/operator/helper/parser.go).

Text templates mirror the reference's parse-operator test shapes:
  1. key-value:  LOG lvl=<sev> tool=<t> latency_ms=<n> status=<ok|err>
                 (key_value_parser, operator/parser/keyvalue/parser.go:15-52)
  2. syslog-ish: <iso> [<SEV>] <component>: <message>
                 (regex_parser, operator/parser/regex/parser.go:16-67)
  3. JSON:       {"event":"..","tokens":N,"model":".."}
                 (json_parser, operator/parser/jsonparser/parser.go)
  4. free text   (passthrough / unparsed fallback)

Generation is pure Python + pyarrow (no Spark) so the SAME parquet bytes are
read by Spark and the DuckDB oracle — per-turn text equality is then exact.
Everything is seeded; same tier ⇒ same file content.
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

# tier -> (n_convs, mean_turns, zipf_alpha, max_turns)
TIERS: dict[str, tuple[int, int, float, int]] = {
    "t1": (100, 8, 0.0, 16),          # ~800 rows, fast pytest
    "t2": (2000, 25, 1.1, 2000),      # ~50k rows, correctness + skew
    "bench": (240000, 50, 1.1, 8000),  # ~7M rows, scaling runs
}

# tiers written as a DIRECTORY of shard files (a single parquet file caps
# scan parallelism at its row-group count; a 100 TB table is thousands of
# files, so the bench input must be splittable the same way)
TIER_SHARDS: dict[str, int] = {"bench": 128}

_SEED = 42
_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "code", "browser", "calc", "none"]
SEVERITIES = ["debug", "info", "warning", "err"]
COMPONENTS = ["planner", "executor", "memory", "sandbox", "router"]
EVENTS = ["tool_call", "completion", "retry", "handoff"]
MODELS = ["alpha-1", "beta-2", "gamma-3"]
WORDS = (
    "the quick brown fox jumps over lazy dog while agent runs query plan "
    "over table scan and shuffle join with broadcast hash aggregate"
).split()


def repo_root() -> str:
    return os.environ.get("SPARK_GRAFT_REPO", os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def tier_dir(tier: str) -> str:
    return os.path.join(repo_root(), "fixtures_data", tier)


def dims_dir() -> str:
    return os.path.join(repo_root(), "fixtures_data", "dims")


def transcripts_path(tier: str) -> str:
    return os.path.join(tier_dir(tier), "transcripts.parquet")


def tier_for_sf_dir(sf_dir: str) -> str:
    """Map the driver's sf dir to a transcript tier of comparable volume."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}.get(base, "t2")


def _zipf_sizes(rng: random.Random, n_convs: int, mean: int, alpha: float, cap: int) -> list[int]:
    if alpha <= 0:
        return [max(1, int(rng.gauss(mean, mean / 4))) for _ in range(n_convs)]
    # rank-based Zipf: size ~ C / rank^alpha, scaled to hit the target mean
    raw = [1.0 / ((i + 1) ** alpha) for i in range(n_convs)]
    scale = mean * n_convs / sum(raw)
    sizes = [min(cap, max(1, int(r * scale))) for r in raw]
    rng.shuffle(sizes)
    return sizes


def _render_text(rng: random.Random, role: str, tool: str, ts: _dt.datetime) -> str:
    """Pick a template deterministically; ~2% unparsable."""
    r = rng.random()
    if r < 0.02:  # deliberately unparsable
        return "LOG lvl= ??? " + " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 8)))
    if role == "tool" or (tool != "none" and r < 0.55):
        sev = rng.choices(SEVERITIES, weights=[2, 6, 2, 1])[0]
        status = "err" if rng.random() < 0.10 else "ok"
        return f"LOG lvl={sev} tool={tool} latency_ms={rng.randint(1, 5000)} status={status}"
    if role == "system" or r < 0.35:
        sev = rng.choices(SEVERITIES, weights=[2, 6, 2, 1])[0].upper()
        comp = rng.choice(COMPONENTS)
        msg = " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 12)))
        iso = ts.strftime("%Y-%m-%dT%H:%M:%S")
        return f"{iso} [{sev}] {comp}: {msg}"
    if role == "assistant" and r < 0.65:
        ev = rng.choice(EVENTS)
        return f'{{"event":"{ev}","tokens":{rng.randint(1, 4000)},"model":"{rng.choice(MODELS)}"}}'
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(8, 30)))


def generate_transcripts(tier: str) -> dict[str, list]:
    n_convs, mean_turns, alpha, cap = TIERS[tier]
    rng = random.Random(f"{_SEED}:{tier}")
    sizes = _zipf_sizes(rng, n_convs, mean_turns, alpha, cap)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[_dt.datetime] = []

    for ci, n_turns in enumerate(sizes):
        conv_id = f"conv-{ci:08d}"
        start = _EPOCH + _dt.timedelta(seconds=rng.randint(0, 90 * 24 * 3600))
        ts = start
        for ti in range(n_turns):
            if ti == 0:
                role = "system" if rng.random() < 0.3 else "user"
            else:
                role = rng.choices(ROLES, weights=[4, 5, 1, 2])[0]
            tool = rng.choice(TOOLS[:4]) if role in ("assistant", "tool") and rng.random() < 0.5 else "none"
            # ~1% of rows share ts with the previous turn (tie-break coverage)
            if ti > 0 and rng.random() >= 0.01:
                ts = ts + _dt.timedelta(milliseconds=rng.randint(200, 30000))
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            tools.append(tool)
            tss.append(ts)
            texts.append(_render_text(rng, role, tool, ts))

    # shuffle emission order so the stable-order window does real work
    order = list(range(len(conv_ids)))
    rng.shuffle(order)
    return {
        "conv_id": [conv_ids[i] for i in order],
        "turn_idx": [turn_idxs[i] for i in order],
        "role": [roles[i] for i in order],
        "text": [texts[i] for i in order],
        "tool": [tools[i] for i in order],
        "ts": [tss[i] for i in order],
    }


_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def ensure_tier(tier: str) -> str:
    """Generate the tier's transcripts parquet if missing; return its path.

    Sharded tiers (TIER_SHARDS) are written as a directory of K files so the
    Spark scan gets K input splits; single-file tiers stay single-file so the
    DuckDB oracle reads the identical bytes by path."""
    path = transcripts_path(tier)
    shards = TIER_SHARDS.get(tier, 0)
    done_marker = os.path.join(path, "_DONE") if shards else path
    if not os.path.exists(done_marker):
        os.makedirs(tier_dir(tier), exist_ok=True)
        cols = generate_transcripts(tier)
        table = pa.Table.from_pydict(cols, schema=_SCHEMA)
        if shards:
            os.makedirs(path, exist_ok=True)
            n = table.num_rows
            per = (n + shards - 1) // shards
            for s in range(shards):
                chunk = table.slice(s * per, per)
                if chunk.num_rows:
                    pq.write_table(
                        chunk,
                        os.path.join(path, f"part-{s:05d}.parquet"),
                        compression="snappy",
                        row_group_size=64 * 1024,
                    )
            with open(done_marker, "w") as f:
                f.write("ok")
        else:
            pq.write_table(table, path, compression="snappy", row_group_size=128 * 1024)
    return path


# --- enrich dimensions (FIXTURES.md §2-3) ---------------------------------
# tool_dim deliberately misses 'calc' (tests left-join default_value, per
# lookupprocessor README `default: "Unknown"`).

TOOL_DIM = [
    ("search", "retrieval", 1.5),
    ("code", "execution", 3.0),
    ("browser", "io", 2.0),
    ("none", "n/a", 0.0),
    ("shell", "execution", 4.0),  # present in dim, absent in data
]

ROLE_DIM = [
    ("user", "human", "info"),
    ("assistant", "model", "info"),
    ("system", "infra", "warning"),
    ("tool", "infra", "debug"),
]


def ensure_dims() -> tuple[str, str]:
    d = dims_dir()
    os.makedirs(d, exist_ok=True)
    tool_path = os.path.join(d, "tool_dim.parquet")
    role_path = os.path.join(d, "role_dim.parquet")
    if not os.path.exists(tool_path):
        t = pa.Table.from_pydict(
            {
                "tool": [r[0] for r in TOOL_DIM],
                "tool_category": [r[1] for r in TOOL_DIM],
                "tool_cost_weight": [r[2] for r in TOOL_DIM],
            }
        )
        pq.write_table(t, tool_path)
    if not os.path.exists(role_path):
        t = pa.Table.from_pydict(
            {
                "role": [r[0] for r in ROLE_DIM],
                "role_group": [r[1] for r in ROLE_DIM],
                "severity_default": [r[2] for r in ROLE_DIM],
            }
        )
        pq.write_table(t, role_path)
    return tool_path, role_path
