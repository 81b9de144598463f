#!/bin/sh
# Round-3 measurement batch 2: post tiered-wide/occlusion-monotone state.
#   nohup sh benchmarks/r3_batch2.sh > /tmp/r3_batch2.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== r3_knockout (production chain, 3 scenes) ==="
timeout 3000 python benchmarks/r3_knockout.py
echo "=== r3_stage2 (slot-path stages) ==="
timeout 3000 python benchmarks/r3_stage2.py
echo "=== bench preview ==="
timeout 3000 python bench.py
echo "=== batch2 done ==="
