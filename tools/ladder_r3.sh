#!/bin/bash
# Post-optimization (HEAD) scaling ladder: 16M amortization pair first
# (4->16 cores on the SAME input), then the 8M ladder. Pairs run
# back-to-back so both legs share box conditions. SPARK_DRIVER_MEM=48g:
# the 16M legs cache a 23M-row seen set; the 8g default OOMs.
cd /root/repo
for CN in "16 16000000 10000" "4 16000000 10000" "32 8000000 5000" "16 8000000 5000" "8 8000000 5000" "4 8000000 5000"; do
  set -- $CN
  C=$1; N=$2; H=$3
  L=$(SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=$C SPARK_GRAFT_TRIALS=3 sbt -batch "runMain graft.BenchCrawl $N $H" 2>/dev/null | grep -a '"metric"' | sed 's/^\[info\] //')
  if [ -n "$L" ]; then
    echo "{\"t\":\"$(date -u +%H:%M:%S)\",\"load\":\"$(cut -d' ' -f1 /proc/loadavg)\",$(echo $L | cut -c2-)" >> /root/.graft/scalebench.log
  else
    # a failed leg (OOM, sbt error) must be a well-formed, visible record,
    # not a truncated JSON line a reader silently chokes on
    echo "{\"t\":\"$(date -u +%H:%M:%S)\",\"load\":\"$(cut -d' ' -f1 /proc/loadavg)\",\"error\":\"leg failed: cpus=$C n=$N hosts=$H\"}" >> /root/.graft/scalebench.log
  fi
done
tail -6 /root/.graft/scalebench.log
