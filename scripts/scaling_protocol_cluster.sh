#!/bin/bash
# Multi-JVM N-vs-4N scaling protocol (VERDICT r2 "Missing #3"): the SAME
# job + input as scaling_protocol.sh, but on SEPARATE executor JVMs via
# Spark's local-cluster master — a standalone Worker forks real executor
# processes, so task results, shuffle blocks and broadcasts cross true
# serialization + IPC boundaries instead of living in one shared heap.
# N = 2 workers x 2 cores (4), 4N = 8 workers x 2 cores (16); interleaved
# reps, min per config (co-tenant noise protocol, BASELINE.md).
#
# Fault-tolerance caveat (ADVICE r4): the suffix pass's localCheckpoint
# (SuffixPass.scala) truncates lineage into executor-local blocks — fine on
# local[n] (one JVM) and acceptable here (this box kills no executors), but
# on a REAL cluster a lost executor fails the stage instead of recomputing.
# A production deployment should use reliable checkpoints
# (sparkContext.setCheckpointDir on HDFS/S3) for the suffix candidate table.
set -e
cd "$(dirname "$0")/.."
MULT=${MULT:-100}   # 100 -> 500k docs from sf0.1
for rep in 1 2 3; do
  for w in 2 8; do
    cores=$((w * 2))
    out=/tmp/bench_lc_${cores}_${rep}.json
    SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_LOCAL_DIRS=/dev/shm/spark-local \
    SPARK_GRAFT_MASTER="local-cluster[$w,2,4096]" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_MULT=$MULT \
    SPARK_GRAFT_CPUS=$cores \
    SPARK_GRAFT_BENCH_ONLY=dedup_end_to_end,dedup_kernel_only \
    SPARK_GRAFT_BENCH_OUT=$out sbt -batch "runMain graft.Bench" > /dev/null 2>&1
    echo "rep$rep cores$cores: $(python3 -c "import json;print(json.load(open('$out'))['queries'])")"
  done
done
echo "efficiency = (min T_4 / min T_16) / 4"
