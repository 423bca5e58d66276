#!/bin/bash
# Run the crawl via spark-submit --py-files (the cluster deployment path).
#
#   scripts/submit_crawl.sh [--master local[16]] [crawl_loop args...]
#
# Packages the library into a zip shipped to executors; on a real cluster
# swap --master for yarn/k8s and the same artifact runs unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="local[16]"
if [[ "${1:-}" == "--master" ]]; then
    MASTER="$2"; shift 2
fi

ZIP=/tmp/osse_spark_pkg.zip
rm -f "$ZIP"
zip -qr "$ZIP" open_source_search_engine_spark -x '*__pycache__*'

export OSSE_UNDER_SPARK_SUBMIT=1
exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-16}" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.local.dir=/dev/shm/spark-local \
    --py-files "$ZIP" \
    scripts/crawl_submit_main.py "$@"
