#!/bin/bash
# One N->4N scaling-evidence pair (BASELINE.md protocol): BenchCrawl 8M at
# local[32] then local[8], back-to-back so both legs see the same box
# conditions. Appends one JSON line per leg to /root/.graft/scalebench.log.
cd /root/repo
for C in 32 8; do
  T=3; [ "$C" = 32 ] && T=4
  L=$(SPARK_GRAFT_CPUS=$C SPARK_GRAFT_TRIALS=$T sbt -batch "runMain graft.BenchCrawl 8000000 5000" 2>/dev/null | grep -a '"metric"' | sed 's/^\[info\] //')
  echo "{\"t\":\"$(date -u +%H:%M:%S)\",\"load\":\"$(cut -d' ' -f1 /proc/loadavg)\",$(echo $L | cut -c2-)" >> /root/.graft/scalebench.log
done
tail -2 /root/.graft/scalebench.log
