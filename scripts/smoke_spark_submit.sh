#!/usr/bin/env bash
# North-rule deployment shape: spark-submit --py-files with the packaged
# engine, driven from OUTSIDE the repo dir so imports resolve from the zip,
# exactly as they would on a cluster. Local master stands in for the cluster
# manager; the same invocation with --master spark://... or yarn is the
# production path.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/submit_smoke.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

cd "$REPO" && zip -qr "$WORK/mimic_iv_etl_spark.zip" mimic_iv_etl_spark
cp "$REPO/scripts/run_replay.py" "$WORK/run_replay.py"

python3 - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, "/root/repo")
from mimic_iv_etl_spark.cdc.changelog import ChangeLogSpec, generate_change_log
generate_change_log(os.path.join(sys.argv[1], "log"),
                    ChangeLogSpec(n_events=20_000, n_convs=500, seed=3))
EOF

cd "$WORK"
SPARK_SUBMIT="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
"$SPARK_SUBMIT" --master "local[4]" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.shuffle.partitions=8 \
    --conf spark.ui.enabled=false \
    --py-files mimic_iv_etl_spark.zip \
    run_replay.py --log-dir "$WORK/log" --table "$WORK/table" \
    --batch-offsets 2000 --buckets 8 --decode-payload --normalize

python3 - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join(sys.argv[1]))
from mimic_iv_etl_spark.session import get_spark_session
from mimic_iv_etl_spark.lake.table import LakeTable
from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
spark = get_spark_session(master="local[4]", shuffle_partitions=8)
got = LakeTable(spark, os.path.join(sys.argv[1], "table")).read()
want = duckdb_final_state(os.path.join(sys.argv[1], "log"))
assert got.count() == len(want), (got.count(), len(want))
print("SPARK-SUBMIT SMOKE PASS:", len(want), "rows")
EOF
