#!/bin/bash
# Round-2 TPU measurement suite: one process at a time, full logs kept.
cd /root/repo
set -x
python benchmarks/tpu_round2.py fused  > /tmp/tpu_fused.log 2>&1
python benchmarks/tpu_round2.py n16k   > /tmp/tpu_16k.log   2>&1
python benchmarks/ess_nuts.py --sweep 16,64,256 --warmup 512 --samples 512 > /tmp/tpu_ess_plain.log 2>&1
python benchmarks/ess_nuts.py --pt --chains 16 --replicas 8 --warmup 512 --samples 512 > /tmp/tpu_ess_pt.log 2>&1
python benchmarks/large_n_bayes.py --n 1024 --chains 8 --compare-xla > /tmp/tpu_large_n_bayes.log 2>&1
echo SUITE_DONE
