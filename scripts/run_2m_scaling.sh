#!/bin/bash
cd /root/repo
SPARK_GRAFT_SCALE_DOCS=2000000 SPARK_GRAFT_LEVELS=1,4 SPARK_GRAFT_SCALE_REPS=2 \
SPARK_GRAFT_SCALING_OUT=BENCH_SCALING_2M.json \
python bench_scaling.py > /tmp/bench_scaling_2m.log 2>&1
echo "scaling EXIT=$?" > /tmp/bench_2m_status
