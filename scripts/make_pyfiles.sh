#!/bin/sh
# Build the spark-submit --py-files artifact (north rule: the engine ships
# as a spark-submit --py-files package).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/linkgraph.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/linkgraph.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("linkgraph/**/*.py")):
        z.write(p, p.as_posix())
print("dist/linkgraph.zip written:", len(z.namelist()), "files")
PY
