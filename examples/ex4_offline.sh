#!/bin/sh
# Long offline capture: 64 MS from the synthetic device, raw cf32 out.
set -e
cd "$(dirname "$0")/.."
time python -m csdr_tpu.apps.soapy_sdr_cli --devname synthetic -s 3.2e6 \
    -n 67108864 -o /tmp/ex4_long
ls -l /tmp/ex4_long.cf32
