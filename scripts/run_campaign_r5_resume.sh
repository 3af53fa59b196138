#!/bin/bash
# round-5 scaling campaign, resumed after session crash (3 of 6 1<->4 pairs done)
cd /root/repo
for i in 4 5 6; do
  python scripts/bench_scaling.py one 1 200000 1
  python scripts/bench_scaling.py one 4 200000 1
done
for i in 1 2 3 4; do
  python scripts/bench_scaling.py one 2 400000 1
  python scripts/bench_scaling.py one 8 400000 1
done
python scripts/bench_scaling.py one 32 200000 2
echo CAMPAIGN_DONE
