#!/bin/sh
# Build dist/pipeline.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pipeline.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/pipeline.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("opentelemetry_collector_contrib_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/pipeline.zip")
EOF
python scripts/check_dist.py
