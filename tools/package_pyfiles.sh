#!/bin/sh
# Package the library for spark-submit --py-files distribution.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/datasketches_pig_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

root = Path(".")
with zipfile.ZipFile("dist/datasketches_pig_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("datasketches_pig_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/datasketches_pig_spark.zip")
EOF
