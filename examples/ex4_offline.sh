#!/bin/sh
# Long offline capture: 64 MS from the synthetic device, raw cf32 out.
set -e
cd "$(dirname "$0")/.."
# `time` as a standalone utility is absent on minimal images — measure in sh
t0=$(date +%s)
python -m csdr_tpu.apps.soapy_sdr_cli --devname synthetic -s 3.2e6 \
    -n 67108864 -o /tmp/ex4_long
echo "elapsed: $(( $(date +%s) - t0 )) s"
ls -l /tmp/ex4_long.cf32
