#!/bin/sh
# Package the engine and run the full pipeline under spark-submit --py-files
# (the north-star launch mode), then resume it to prove checkpoint restart.
# Fails loudly: submit errors are fatal and the resumed run's summary must
# be identical to the cold run's.
set -eu
cd "$(dirname "$0")/.."
CORPUS="${1:-/root/testdata/sf0.001/documents.parquet}"
OUT="${2:-/tmp/smsp_submit_demo}"
LOG="${TMPDIR:-/tmp}/smsp_submit_demo.log"
rm -rf "$OUT" /tmp/smsp.zip
zip -qr /tmp/smsp.zip sneaky_data_matcher_spark
SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

run_submit() {
    if ! "$SUBMIT" --master 'local[8]' --py-files /tmp/smsp.zip \
        tools/submit_pipeline.py "$CORPUS" "$OUT" demo 2>"$LOG"; then
        echo "spark-submit FAILED; stderr tail:" >&2
        tail -20 "$LOG" >&2
        exit 1
    fi
}

echo "== first submit (cold run) =="
FIRST="$(run_submit | tail -1)"
echo "$FIRST"
echo "== second submit (resumes from committed stages) =="
SECOND="$(run_submit | tail -1)"
echo "$SECOND"
if [ "$FIRST" != "$SECOND" ]; then
    echo "RESUME MISMATCH: cold and resumed summaries differ" >&2
    exit 1
fi
echo "resume summary identical: OK"
