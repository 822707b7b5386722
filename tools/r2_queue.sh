#!/bin/sh
# Serial TPU work queue for round 2 (single-client tunnel — one JAX
# process at a time). Launch detached after the main campaign exits:
#   nohup sh tools/r2_queue.sh > r2_queue.log 2>&1 &
set -x
python tools/ablate_sp.py --stall-secs 1200
python tools/run_benchmarks.py \
  --only ibtt-cycle,mpnn-cycle,agtt-cycle,gps-cycle,ibtt-zinc,agtt-zinc,mpnn-zinc,gps-zinc \
  --rerun --stall-secs 1200
python tools/pack_ab.py --stall-secs 1200
python tools/flash_ab.py
# quiet-box CPU measurements (TPU queue done by now)
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/scaling_bench.py --mols 100000 --reps 5
echo QUEUE-DONE
