#!/bin/bash
# Round-5 on-chip finale, in priority order (run when the tunnel is up).
# Each leg's timeout budgets the FULL run incl. jitted diagnostics
# (CLAUDE.md: timeout-killed legs wedge the tunnel — budget generously).
cd /root/repo
set -x

# 1. The driver artifact: qualifier + 5-seed median protocol + headline.
#    Also warms every persistent-cache entry the driver's own bench run
#    will need.
timeout 5400 python bench.py 2>/tmp/finale_bench.err

# 2. Super-panel Cholesky A/B on the n=4096 headline (VERDICT #7).
timeout 1800 python benchmarks/super_panel_ab.py --n 4096 --sf 2 2>/dev/null

# 3. n=16384 exact-path Bayes (VERDICT #5): short sharp-posterior run,
#    chunked dispatches (8 transitions each), scaled init.
timeout 5400 python benchmarks/large_n_bayes.py --n 16384 --chains 4 \
  --warmup 128 --samples 128 --max-steps 8 --chunk 8 \
  --init-spread 0.0125 --init-step 0.004 --init-traj 0.03 2>/dev/null

# 4. n=16384 iterative-PCG fallback comparison.
timeout 3600 python benchmarks/large_n_bayes.py --n 16384 --iterative \
  --chains 4 --warmup 64 --samples 64 --max-steps 4 --chunk 8 \
  --probes 8 --cg-iters 60 --lanczos 16 --precond-rank 32 \
  --init-spread 0.0125 --init-step 0.004 --init-traj 0.02 2>/dev/null

echo FINALE_DONE
