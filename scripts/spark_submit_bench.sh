#!/usr/bin/env bash
# The north rule's deployment path: package the library and launch its
# mains through spark-submit (the same entry a real cluster uses —
# swap --master local[N] for yarn/k8s and the jar is unchanged).
#
#   scripts/spark_submit_bench.sh smoke                    # flagship entry, sf0.001
#   scripts/spark_submit_bench.sh verify <sfDir> <outDir>  # correctness dump
#   scripts/spark_submit_bench.sh bench  <sfDir> [cpus]    # bench JSON line
#
# In this sandbox "two cluster sizes" is evidenced by two parallelism
# levels of the same job (local[8] vs local[32] — Bench runs both and
# records throughput + scaling efficiency); on a real cluster the same
# command takes --num-executors N / 4N instead.
set -euo pipefail
cd "$(dirname "$0")/.."

JAR=target/scala-2.13/bloomdspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package

SUBMIT=/opt/spark/bin/spark-submit
COMMON=(--conf spark.ui.enabled=false
        --conf spark.sql.session.timeZone=UTC
        --driver-memory "${SPARK_DRIVER_MEM:-24g}")

case "${1:?smoke|verify|bench}" in
  smoke)
    exec "$SUBMIT" --class graft.Smoke --master "local[${3:-8}]" \
      "${COMMON[@]}" "$JAR" ;;
  verify)
    exec "$SUBMIT" --class graft.Verify --master "local[${SPARK_GRAFT_CPUS:-8}]" \
      --conf "spark.sql.shuffle.partitions=${SPARK_GRAFT_CPUS:-8}" \
      "${COMMON[@]}" "$JAR" "${2:?sfDir}" "${3:?outDir}" ;;
  bench)
    SPARK_GRAFT_SF_DIR="${2:?sfDir}" SPARK_GRAFT_CPUS="${3:-32}" \
      exec "$SUBMIT" --class graft.Bench --master "local[${3:-32}]" \
      "${COMMON[@]}" "$JAR" ;;
  *) echo "unknown mode $1" >&2; exit 2 ;;
esac
