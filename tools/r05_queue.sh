#!/bin/bash
# Round-5 post-flagship TPU queue (VERDICT r4 #3, #4, #5, #6), in
# judge-value order: gate, headline bench, tile-shape diag, prodscale.
# Each tool has its own timeout; a wedge cannot take down the rest.
cd /root/repo
echo "== shape_gate $(date -u +%H:%M:%S)"
timeout 2400 python tools/shape_gate.py
echo "== shape_gate exit $? $(date -u +%H:%M:%S)"
echo "== bench $(date -u +%H:%M:%S)"
timeout 1800 python bench.py > /root/repo/out/bench_r05_queue.json 2>/root/repo/out/bench_r05_queue.err
echo "== bench exit $? $(date -u +%H:%M:%S)"; tail -c 600 /root/repo/out/bench_r05_queue.json
echo "== diag_tile_shape (banked) $(date -u +%H:%M:%S)"
timeout 3000 python tools/diag_tile_shape.py --binnings banked --iters 3
echo "== diag_tile_shape exit $? $(date -u +%H:%M:%S)"
echo "== diag_production $(date -u +%H:%M:%S)"
timeout 3600 python tools/diag_production.py --cap_policy --fullstep --cache_ab \
  --ckpt out/flagship_r05/stage_selfdistill/checkpoints
echo "== diag_production exit $? $(date -u +%H:%M:%S)"
echo "== queue done $(date -u +%H:%M:%S)"
