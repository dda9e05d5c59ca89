#!/usr/bin/env bash
# spark-submit launcher for the streaming bench (the north rule's launch
# path). On a real cluster, swap --master for the cluster manager and size
# --num-executors for the N / 4N scaling runs; here local[K] cores stand in
# for executors (no multi-node cluster in this sandbox — see BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

exec /opt/spark/bin/spark-submit \
  --class graft.Bench \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.sql.extensions=graft.plans.GraftExtensions \
  --conf spark.sql.session.timeZone=UTC \
  target/scala-2.13/dataflowkitspark_2.13-0.1.0.jar
