#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment
# (north_rule: "runs via spark-submit --py-files on a multi-executor
# cluster").  The zip contains the package at top level so executors
# and the driver import `scrapy_cluster_spark` straight from it.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/scrapy_cluster_spark.zip
python - <<'EOF'
import os, zipfile

with zipfile.ZipFile("dist/scrapy_cluster_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for dirpath, _dirs, files in os.walk("scrapy_cluster_spark"):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                z.write(p, p)
print("wrote dist/scrapy_cluster_spark.zip")
EOF
