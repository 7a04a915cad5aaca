#!/bin/bash
# Package elasticsearch_spark for spark-submit --py-files (north rule).
# Usage: scripts/package.sh [out.zip]   then:
#   spark-submit --py-files dist/elasticsearch_spark.zip your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist/elasticsearch_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
python -c "
import zipfile, os
with zipfile.ZipFile('$OUT', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('elasticsearch_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote $OUT')
"
