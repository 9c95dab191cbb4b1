"""Dist-freshness gate: dist/pipeline.zip must match the source tree
byte-for-byte — a stale archive ships pre-fix code to spark-submit
(the exact failure mode: a fix lands in the package but the zip keeps
the old bytes). Exit 1 lists stale/missing/extra entries."""

from __future__ import annotations

import os
import sys
import zipfile

os.chdir(os.path.join(os.path.dirname(__file__), ".."))

src: dict[str, bytes] = {}
for root, _dirs, files in os.walk("opentelemetry_collector_contrib_spark"):
    if "__pycache__" in root:
        continue
    for f in files:
        if f.endswith(".py"):
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                src[p] = fh.read()

problems: list[str] = []
try:
    with zipfile.ZipFile("dist/pipeline.zip") as z:
        names = set(z.namelist())
        for p, body in sorted(src.items()):
            if p not in names:
                problems.append(f"missing from zip: {p}")
            elif z.read(p) != body:
                problems.append(f"stale in zip: {p}")
        for n in sorted(names - set(src)):
            problems.append(f"extra in zip: {n}")
except FileNotFoundError:
    problems.append("dist/pipeline.zip does not exist — run scripts/make_dist.sh")

if problems:
    print("\n".join(problems))
    print(f"DIST STALE ({len(problems)} issues) — run scripts/make_dist.sh")
    sys.exit(1)
print(f"dist/pipeline.zip fresh ({len(src)} files byte-identical)")
