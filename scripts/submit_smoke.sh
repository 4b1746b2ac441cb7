#!/usr/bin/env bash
# spark-submit --py-files smoke test (north-rule deployment posture).
#
# Builds the pytod_spark zip, then runs generate + validate through
# `spark-submit --py-files` from a scratch cwd so the package can ONLY
# resolve from the shipped zip — the same packaging a real cluster
# submission uses. Exits non-zero if the suite fails or emits no
# verdicts.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

ZIP="$WORK/pytod_spark.zip"
PYTHONPATH="$REPO" python -c "
from pytod_spark.deploy import build_pyfiles_zip
print(build_pyfiles_zip('$ZIP'))
"
cp "$REPO/scripts/submit_main.py" "$WORK/submit_main.py"

SUBMIT=${SPARK_SUBMIT:-spark-submit}
COMMON=(--master "local[${SPARK_GRAFT_CPUS:-8}]" --py-files "$ZIP"
        --conf spark.ui.enabled=false
        --conf spark.sql.shuffle.partitions=8)

cd "$WORK"   # scratch cwd: no repo checkout on sys.path

"$SUBMIT" "${COMMON[@]}" submit_main.py \
    generate --rows 20000 --out "$WORK/corpus" --parent-out "$WORK/parent"

"$SUBMIT" "${COMMON[@]}" submit_main.py \
    validate --input "$WORK/corpus" --parent "$WORK/parent" \
    --run-dir "$WORK/run1" \
    --constraint 'len_bound=content_length <= 100000' \
    --constraint 'path_ok@0.01=length(path) > 0'

test -d "$WORK/run1/verdicts" || { echo "no verdicts dir"; ls "$WORK/run1"; exit 1; }
test -d "$WORK/run1/constraint_summary" || { echo "no constraint_summary dir"; ls "$WORK/run1"; exit 1; }

"$SUBMIT" "${COMMON[@]}" submit_main.py \
    report --run-dir "$WORK/run1" --examples 2 \
    | tail -1 | python3 -c "
import json, sys
rep = json.loads(sys.stdin.read())
assert rep['partitions'], 'empty report'
print('report partitions:', len(rep['partitions']))
"

# reference-profile deployment path: profile the snapshot once, then
# validate a later run against the persisted profile (dist check on,
# reference corpus never rescanned)
"$SUBMIT" "${COMMON[@]}" submit_main.py \
    profile --input "$WORK/corpus" --out "$WORK/ref_profile"

"$SUBMIT" "${COMMON[@]}" submit_main.py \
    validate --input "$WORK/corpus" --parent "$WORK/parent" \
    --reference-profile "$WORK/ref_profile" --run-dir "$WORK/run2"

test -d "$WORK/run2/dist_drift" || { echo "no dist_drift dir"; ls "$WORK/run2"; exit 1; }
echo "submit_smoke: OK"
