#!/bin/bash
# Alternating A/B measurement of streaming_neardup under the
# SKETCHLIB_ND_FANOUT knob (8 = old coupled width, 32 = core-width
# fan-out). Each sample is a fresh process; waits for loadavg < 1.5
# between samples so exogenous bursts don't bias one arm.
set -u
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
cd /root/repo
for i in 1 2 3; do
  for w in 8 32; do
    while :; do
      l=$(cut -d' ' -f1 /proc/loadavg)
      awk -v l="$l" 'BEGIN{exit !(l<1.5)}' && break
      sleep 10
    done
    out=$(SKETCHLIB_ND_FANOUT=$w python bench_extra.py q streaming_neardup 2>/dev/null | tail -1)
    echo "iter=$i fanout=$w $out"
  done
done
