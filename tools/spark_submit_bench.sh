#!/usr/bin/env bash
# North-rule launch shape: spark-submit at N and 4N parallelism.
# Local sandbox evidence: local[N] / local[4N] on the same input
# (no real cluster here, per driver instruction). On a real cluster:
#   spark-submit --num-executors $N  --class graft.Bench ganonspark.jar
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package >/dev/null
JAR=target/scala-2.13/ganonspark_2.13-0.1.0.jar
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --driver-memory "${SPARK_DRIVER_MEM:-24g}" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.ui.enabled=false \
  --class graft.Bench "$JAR"
