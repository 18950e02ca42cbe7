#!/bin/sh
# Package the engine and run the full pipeline under spark-submit --py-files
# (the north-star launch mode), then resume it to prove checkpoint restart.
set -eu
cd "$(dirname "$0")/.."
CORPUS="${1:-/root/testdata/sf0.001/documents.parquet}"
OUT="${2:-/tmp/smsp_submit_demo}"
rm -rf "$OUT" /tmp/smsp.zip
zip -qr /tmp/smsp.zip sneaky_data_matcher_spark
SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
echo "== first submit (cold run) =="
"$SUBMIT" --master 'local[8]' --py-files /tmp/smsp.zip \
    tools/submit_pipeline.py "$CORPUS" "$OUT" demo 2>/dev/null | tail -1
echo "== second submit (resumes from committed stages) =="
"$SUBMIT" --master 'local[8]' --py-files /tmp/smsp.zip \
    tools/submit_pipeline.py "$CORPUS" "$OUT" demo 2>/dev/null | tail -1
