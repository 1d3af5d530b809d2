#!/bin/bash
# Content-weighted N-vs-4N scaling protocol (round-3 VERDICT next-item #2):
# the driver corpus averages ~54 tokens/doc, which makes the default bench
# shape adversarially shuffle-bound — band/pair rows dominate content bytes.
# Real pre-training corpora run 1-4k tokens/doc and are kernel-dominated.
# SPARK_GRAFT_LENMULT pads every base doc with deterministic unique tokens
# BEFORE replication (near-dup replicas share the whole padded body, so dup
# structure is preserved at realistic lengths), reproducing that phase mix
# under the same interleaved min-of-3, 4<->16-core discipline as
# scaling_protocol.sh.
set -e
cd "$(dirname "$0")/.."
MULT=${MULT:-10}        # 50k docs from sf0.1
LENMULT=${LENMULT:-32}  # ~1.7k tokens/doc (non-dup replicas ~3.4k)
# interleave: non-dup replicas are TRUE non-dups (token-interleaved junk);
# "mixed" at long lengths turns every replica group into one suffix clique
# via the verbatim base-text prefix — adversarial, not the realistic ~25%
# dup-mass web shape this protocol is about
DUPMODE=${DUPMODE:-interleave}
for rep in 1 2 3; do
  for cpus in 4 16; do
    out=/tmp/bench_cw_${cpus}_${rep}.json
    SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_MULT=$MULT SPARK_GRAFT_LENMULT=$LENMULT SPARK_GRAFT_CPUS=$cpus \
    SPARK_GRAFT_DUPMODE=$DUPMODE SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_BENCH_ONLY=dedup_end_to_end,dedup_kernel_only \
    SPARK_GRAFT_BENCH_OUT=$out sbt -batch "runMain graft.Bench" > /dev/null 2>&1
    echo "rep$rep cpus$cpus: $(python3 -c "import json;print(json.load(open('$out'))['queries'])")"
  done
done
echo "efficiency = (min T_4 / min T_16) / 4"
