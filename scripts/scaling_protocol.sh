#!/bin/bash
# N-vs-4N scaling-efficiency protocol (BASELINE.md): identical job + input
# at two parallelism levels, interleaved reps, min per config. The VM is
# CPU-overcommitted (15-20% steal under load), hence interleaving and the
# 4<->16 pair (stays under the hypervisor cap). Shuffle on tmpfs.
set -e
cd "$(dirname "$0")/.."
MULT=${MULT:-100}   # 100 -> 500k docs from sf0.1
for rep in 1 2 3; do
  for cpus in 4 16; do
    out=/tmp/bench_scale_${cpus}_${rep}.json
    SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_MULT=$MULT SPARK_GRAFT_CPUS=$cpus \
    SPARK_GRAFT_BENCH_ONLY=dedup_end_to_end,dedup_kernel_only \
    SPARK_GRAFT_BENCH_OUT=$out sbt -batch "runMain graft.Bench" > /dev/null 2>&1
    echo "rep$rep cpus$cpus: $(python3 -c "import json;print(json.load(open('$out'))['queries'])")"
  done
done
echo "efficiency = (min T_4 / min T_16) / 4"
