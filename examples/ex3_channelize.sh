#!/bin/sh
# 20-channel PFB split of a 16 MS capture — the reference's example 3
# (README.md:184-195): every channel file must be exactly n/20 samples.
set -e
cd "$(dirname "$0")/.."
python - <<'EOF'
import numpy as np
n = 16_000_000
rng = np.random.default_rng(0)
t = np.arange(n)
x = np.zeros(n, np.complex128)
for k, f in enumerate((-0.45, -0.25, -0.05, 0.15, 0.35)):
    x += 0.3*np.exp(2j*np.pi*np.mod(f*t, 1.0))
x += 0.02*(rng.standard_normal(n) + 1j*rng.standard_normal(n))
x.astype(np.complex64).tofile("/tmp/ex3_cap.cf32")
print("wrote 16 MS capture")
EOF
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex3_cap.cf32 \
    -s 1.6e6 -n 16000000 -c 20 -o /tmp/ex3_split
ls -l /tmp/ex3_split_ch*.cf32 | head -5
echo "each file should be $((16000000/20*8)) bytes (= 800 kS/ch, the"
echo "reference's 6,400,000-byte invariant at its 16 MS example size)"
