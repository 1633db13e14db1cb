#!/usr/bin/env bash
# Round-7 R-vs-quotient probe (VERDICT r6 #1): for each corpus, run the
# cluster job at 1x4 and 4x4 executors (warmup + 1 timed run per leg),
# record t1/t4 plus the CC phase log (quotient edges, setup/solve ms).
# R = t4 - t1/4 per pair; the claim under test is that R tracks the
# QUOTIENT (dup structure), not the corpus size.
#
#   tools/r7_rprobe.sh <label:path> [<label:path> ...]
set -euo pipefail
cd "$(dirname "$0")/.."

JAR=target/scala-2.13/ocrpipelinespark_2.13-0.1.0.jar
PGC="spark.executor.extraJavaOptions=-XX:+UseParallelGC -XX:ParallelGCThreads=4"
OUT=/tmp/graft_bench/r7_rprobe.jsonl
mkdir -p /tmp/graft_bench

for spec in "$@"; do
  label="${spec%%:*}"; input="${spec#*:}"
  for pair in "local-cluster[4,4,8192] n4x4" "local-cluster[1,4,8192] n1x4"; do
    master="${pair% *}"; size="${pair#* }"
    echo "== $label $size $(date +%H:%M:%S) loadavg=$(cut -d' ' -f1-3 /proc/loadavg)" >&2
    SPARK_GRAFT_BENCH_RUNS=1 /opt/spark/bin/spark-submit --master "$master" \
      --driver-memory 4g --conf "$PGC" \
      --class graft.ClusterBench "$JAR" "$input" "${label}_${size}" cluster \
      2>/tmp/graft_bench/r7_${label}_${size}.err | grep '"metric"' \
      | tee -a "$OUT"
    grep -h 'graft.cc' "/tmp/graft_bench/r7_${label}_${size}.err" | tail -2 >&2 || true
  done
done
echo "pairs appended to $OUT" >&2
