#!/bin/sh
# Round-3 measurement batch 3: pack sweep + shading attribution.
#   nohup sh benchmarks/r3_batch3.sh > /tmp/r3_batch3.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site
echo "=== r3_packsweep ==="
timeout 2400 python benchmarks/r3_packsweep.py
echo "=== r3_shade_soa ==="
timeout 2400 python benchmarks/r3_shade_soa.py
echo "=== r3_shadeknock (Cornell in-graph shading attribution) ==="
timeout 3600 python benchmarks/r3_shadeknock.py
echo "=== batch3 done ==="
