#!/usr/bin/env bash
# The north rule's deployment + scaling clause, measured through the
# LITERAL path it names: `spark-submit --py-files pytod_spark.zip` at
# two cluster sizes (N and 4N cores standing in for N and 4N
# executors — this sandbox is one host; see BENCH/BASELINE.md for why
# the single-host pair is a LOWER bound on cluster scaling).
#
# scripts/run_scaling.py is the headline methodology (equal wall
# budgets, three levels, one session); this script is the
# complementary evidence that the SAME job shipped the SAME way a real
# cluster receives it (zip-only module resolution, scratch cwd, no
# repo on sys.path) scales across the pair. Corpus and run dirs live
# on tmpfs for the same shared-virtio-disk reason run_scaling.py
# documents.
#
# Usage: scripts/submit_scaling.sh            # 1M rows, 4 reps, 1 vs 4 cores
#   ROWS=2000000 REPS=3 LVL_A=4 LVL_B=16 scripts/submit_scaling.sh
#
# Writes BENCH/submit_scaling.json.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ROWS=${ROWS:-1000000}
REPS=${REPS:-4}
LVL_A=${LVL_A:-1}
LVL_B=${LVL_B:-4}

WORK=/dev/shm/pytod_submit_scaling
rm -rf "$WORK"; mkdir -p "$WORK"
trap 'rm -rf "$WORK"' EXIT

ZIP="$WORK/pytod_spark.zip"
PYTHONPATH="$REPO" python -c "
from pytod_spark.deploy import build_pyfiles_zip
print(build_pyfiles_zip('$ZIP'))
"
cp "$REPO/scripts/submit_main.py" "$WORK/submit_main.py"
SUBMIT=${SPARK_SUBMIT:-spark-submit}
cd "$WORK"   # scratch cwd: pytod_spark resolves ONLY from the zip

"$SUBMIT" --master "local[8]" --py-files "$ZIP" \
    --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
    --conf "spark.local.dir=$WORK/spark-tmp" \
    submit_main.py generate --rows "$ROWS" \
    --out "$WORK/corpus" --parent-out "$WORK/parent" 2>"$WORK/gen.log" \
    || { tail -30 "$WORK/gen.log"; exit 1; }

for CPUS in "$LVL_A" "$LVL_B"; do
    echo "== spark-submit validate at local[$CPUS], $REPS reps" >&2
    "$SUBMIT" --master "local[$CPUS]" --py-files "$ZIP" \
        --conf spark.ui.enabled=false \
        --conf spark.sql.shuffle.partitions=$(( 4 * CPUS > 8 ? 4 * CPUS : 8 )) \
        --conf spark.driver.memory=16g \
        --conf "spark.local.dir=$WORK/spark-tmp" \
        submit_main.py validate --input "$WORK/corpus" --parent "$WORK/parent" \
        --run-dir "$WORK/run_$CPUS" --repeats "$REPS" \
        2>"$WORK/validate_$CPUS.log" | tail -1 > "$WORK/result_$CPUS.json" \
        || { tail -30 "$WORK/validate_$CPUS.log"; exit 1; }
done

LVL_A="$LVL_A" LVL_B="$LVL_B" ROWS="$ROWS" REPS="$REPS" WORK="$WORK" \
REPO="$REPO" python - <<'EOF'
import json, os

work, repo = os.environ["WORK"], os.environ["REPO"]
a, b = int(os.environ["LVL_A"]), int(os.environ["LVL_B"])
res = {}
for cpus in (a, b):
    with open(f"{work}/result_{cpus}.json") as f:
        m = json.load(f)
    res[f"local[{cpus}]"] = {
        "cpus": cpus,
        "files_per_sec": m["files_per_sec"],
        "reps_sec": m.get("reps_sec"),
    }
eff = res[f"local[{b}]"]["files_per_sec"] / (
    (b / a) * res[f"local[{a}]"]["files_per_sec"]
)
out = {
    "methodology": "scripts/submit_scaling.sh: the validate job shipped "
    "via spark-submit --py-files (zip-only module resolution, scratch "
    "cwd) at two core counts on the same tmpfs corpus; best-of-REPS "
    "inside each single JVM, all reps listed",
    "rows": int(os.environ["ROWS"]),
    "reps": int(os.environ["REPS"]),
    "levels": res,
    "pair": f"{a}->{b}",
    "efficiency": round(eff, 3),
}
path = os.path.join(repo, "BENCH", "submit_scaling.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
