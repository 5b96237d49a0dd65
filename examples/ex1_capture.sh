#!/bin/sh
# Raw capture from the (synthetic) SDR device -> output.cf32
set -e
cd "$(dirname "$0")/.."
python -m csdr_tpu.apps.soapy_sdr_cli --devname synthetic -s 2.56e6 \
    -n 8388608 -o /tmp/ex1_output
ls -l /tmp/ex1_output.cf32
