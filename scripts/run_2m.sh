#!/bin/bash
# Round-5 2M-doc scale-up evidence driver (quiet protocol: run alone).
cd /root/repo
SPARK_GRAFT_SCALE_DOCS=2000000 SPARK_GRAFT_LEVELS=2,8 SPARK_GRAFT_SCALE_REPS=2 \
SPARK_GRAFT_SCALING_OUT=BENCH_SCALING_2M.json SPARK_GRAFT_KEEP_IDX=1 \
python bench_scaling.py > /tmp/bench_scaling_2m.log 2>&1
echo "scaling EXIT=$?" >> /tmp/bench_2m_status
SPARK_GRAFT_SCALE_DOCS=2000000 SPARK_GRAFT_CPUS=8 BENCH2M_INDEX=/dev/shm/pim_bench/idx_8 \
python scripts/bench_2m.py > /tmp/bench_2m.log 2>&1
echo "bench2m EXIT=$?" >> /tmp/bench_2m_status
