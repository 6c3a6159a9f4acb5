#!/bin/bash
# Watch for a quiet write-throttle epoch (2 consecutive probes > 3 GB/s);
# when found, launch one crawl scaling session (repeats=4) and exit.
cd /root/repo
streak=0
for i in $(seq 1 200); do
  mbps=$(python - <<'PY'
import numpy as np, time, os, tempfile
a = np.random.bytes(200*1024*1024)
t=time.time()
with tempfile.NamedTemporaryFile(dir="/tmp", delete=True) as f:
    f.write(a); f.flush(); os.fsync(f.fileno())
print(int(200/(time.time()-t)))
PY
)
  echo "$(date +%H:%M:%S) probe ${mbps} MB/s (streak ${streak})"
  if [ "$mbps" -gt 3000 ]; then streak=$((streak+1)); else streak=0; fi
  if [ "$streak" -ge 2 ]; then
    echo "$(date +%H:%M:%S) QUIET EPOCH — launching crawl scaling session K"
    python bench.py --scaling --sections crawl_executors --repeats 4 \
      > /root/repo/BENCH/scaling_sessionK_raw.log 2>&1
    echo "$(date +%H:%M:%S) session K done"
    exit 0
  fi
  sleep 300
done
