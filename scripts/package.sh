#!/bin/sh
# Build the --py-files archive for spark-submit deployment.
set -e
cd "$(dirname "$0")/.."
rm -f gazetteer_search_spark.zip
python - <<'PY'
import zipfile, os
with zipfile.ZipFile("gazetteer_search_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("gazetteer_search_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote gazetteer_search_spark.zip")
PY
