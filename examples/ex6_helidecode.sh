#!/bin/sh
# NBFM-with-sync capture -> symsync output -> helidecode -> KML
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
k = 10
text = "AN 52 3045\r\nBW 21 0030\r\n"
payload = (b"\xff\xff" + (text*3).encode())[:71]
frame = "".join("".join("1" if (b>>j)&1 else "0" for j in range(8)) + "11" for b in payload)
sync = "1100000000" + "0100000000"
bits = (sync + frame) * 20 + sync
sym = np.array([+1.0 if c=="0" else -1.0 for c in bits])  # '0' slices positive
iq = np.exp(1j*2*np.pi*np.cumsum(np.repeat(sym*0.02*k*0.5, k))).astype(np.complex64)
iq.tofile("/tmp/ex6_fsk.cf32")
PYEOF
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex6_fsk.cf32 \
    -n 500000 --demod "DeNBFMSync 10" -o /tmp/ex6_sync
python -m csdr_tpu.apps.helidecode /tmp/ex6_sync.f32
mv output.kml output.m /tmp/ 2>/dev/null || true
ls -l /tmp/output.kml
