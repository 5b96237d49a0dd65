#!/bin/sh
# Stereo FM: generated MPX composite, FM-modulated -> stereo WAV
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
from csdr_tpu.utils import testsig
quad = 192000.0
n = 1 << 20
t = np.arange(n)/quad
L = 0.6*np.sin(2*np.pi*500.0*t); R = 0.6*np.sin(2*np.pi*1800.0*t)
mpx = 0.45*(L+R) + 0.1*np.cos(2*np.pi*19000*t) + 0.45*(L-R)*np.cos(2*np.pi*38000*t)
testsig.fm_mod((0.3*mpx).astype(np.float32), 0.8).tofile("/tmp/ex5_fms.cf32")
PYEOF
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex5_fms.cf32 \
    -s 192e3 -n 1048576 --demod "DeFMS 4 WAV" -o /tmp/ex5_stereo
ls -l /tmp/ex5_stereo.wav
