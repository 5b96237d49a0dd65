#!/bin/sh
# WBFM receive: generated broadcast-FM capture -> mono WAV at 25 kHz
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
from csdr_tpu.utils import testsig
from scipy.signal import firwin, lfilter
n = 1 << 21
rng = np.random.default_rng(0)
msg = lfilter(firwin(301, 2*5000/200e3), [1.0], rng.normal(size=n))
msg = (msg/(3*np.max(np.abs(msg)))).astype(np.float32)
testsig.fm_mod(msg, 0.6).tofile("/tmp/ex2_cap.cf32")
PYEOF
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex2_cap.cf32 \
    -s 200e3 -n 2097152 --demod "DeWBFM 8 WAV" -o /tmp/ex2_radio
ls -l /tmp/ex2_radio.wav
