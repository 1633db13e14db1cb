#!/usr/bin/env bash
# Reproduce the two-cluster-size scaling evidence (BENCH.md):
# identical extraction job via spark-submit at 1 executor vs 4
# executors (real executor JVMs), identical pre-generated input.
set -euo pipefail
cd "$(dirname "$0")/.."

NDOCS="${1:-2000000}"
SPANS="${2:-/tmp/graft_bench/spans2m}"
JAR=target/scala-2.13/ocrpipelinespark_2.13-0.1.0.jar

sbt -batch package >/dev/null
if [ ! -d "$SPANS" ]; then
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.GenCorpus $SPANS $NDOCS skewed 128" | grep '"metric"'
fi

for m in "local-cluster[1,4,8192] n1x4" "local-cluster[4,4,8192] n4x4"; do
  set -- $m
  /opt/spark/bin/spark-submit --master "$1" --driver-memory 4g \
    --class graft.ClusterBench "$JAR" "$SPANS" "$2" 2>/dev/null | grep '"metric"'
done
echo "efficiency = (docs_per_sec_n4x4 / docs_per_sec_n1x4) / 4  (target >= 0.8)"
# Other stage families (see BENCH.md). Both alloc-heavy families (parse
# AND dedup) need ParallelGC to clear 0.8 at multi-executor scale — G1
# measures 0.71-0.78 (parse, r2) / 0.76 (dedup, r3) on the same jobs:
#   dedup job:  spark-submit --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \
#                 ... graft.ClusterBench <spans> <label> dedup
#   parse job:  sbt "runMain graft.GenCorpus /tmp/graft_bench/xml2m 2000000 skewed 128 xml"
#               spark-submit --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \
#                 ... graft.ClusterBench /tmp/graft_bench/xml2m <label> parse
