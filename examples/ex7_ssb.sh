#!/bin/sh
# SSB voice receive (capability extension — the reference stops at FM/AM/FSK):
# a USB transmission synthesized from multi-tone "voice", demodulated with
# --demod "DeUSB 3000 WAV" and teed to a live player if one is installed.
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
import scipy.signal as sig
fs = 48000.0
n = 1 << 19
t = np.arange(n)/fs
voice = sum(np.sin(2*np.pi*f*t + i) for i, f in enumerate((400.0, 1100.0, 2300.0)))/3
# physically-mixed SSB baseband is half the analytic signal (Re[A e^{jwct}]
# mixed down); the demodulator's default gain=2 undoes it
(0.5*sig.hilbert(voice)).astype(np.complex64).tofile("/tmp/ex7_usb.cf32")
PYEOF
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex7_usb.cf32 \
    -s 48e3 -n 524288 --demod "DeUSB 3000 WAV" -o /tmp/ex7_voice
ls -l /tmp/ex7_voice.wav
