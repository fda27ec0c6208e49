#!/bin/bash
# Probe the axon relay. Exits 0 the moment jax.devices() returns promptly,
# exits 7 after N failed probes (caller restarts). Kills only the exact
# probe PID via timeout(1), never by pattern.
cd /root/repo
LOG=results/r4_runs/relay_probe.log
for i in 1 2; do
  if timeout 90 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "RECOVERED $(date -u +%FT%TZ)" >> $LOG
    exit 0
  fi
  echo "wedged $(date -u +%FT%TZ) probe=$i" >> $LOG
  [ $i -lt 2 ] && sleep 240
done
exit 7
