#!/bin/sh
# Band-scale monitoring: decode POCSAG pages on three different carriers of
# an 8-channel paging band in ONE device graph (PFB split + per-channel
# discriminator — channels are a tensor axis), plus an RTTY teletype decode
# through the CLI's authentic HF chain (USB demod → dual-tone discriminator).
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
import csdr_tpu as cs
from csdr_tpu.models import pocsag as pg, rtty

# --- 8-channel paging band, pages on channels 1 / 4 / 6 ---
nch, chan_rate = 8, 24000.0
pages = {1: (100001, "CH ONE"), 4: (200002, "WX ALERT"), 6: (300003, "911 4")}
streams = {ch: pg.pocsag_modulate(pg.make_transmission(r, t), chan_rate)
           for ch, (r, t) in pages.items()}
n = max(len(b) for b in streams.values()) * nch
t = np.arange(n)
rng = np.random.default_rng(0)
band = 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n))
for ch, bb in streams.items():
    band += 0.5 * np.repeat(bb, nch)[:n] * np.exp(
        2j * np.pi * np.mod((ch - (nch - 1) / 2) / nch * t, 1.0))
g = pg.pocsag_band_monitor(nch, chan_rate)
rx = cs.CollectSink()
cs.Pipeline(g, block_size=g.granule * 128).run(
    iter([band.astype(np.complex64)]), rx)
for m in pg.decode_channels(rx.concat(), chan_rate):
    print(f"ch{m['channel']}: RIC {m['ric']} [{m['kind']}] {m['text']}")

# --- RTTY over USB for the CLI step below ---
import scipy.signal as sig
audio = rtty.rtty_modulate("CQ CQ DE EX11 RYRY 73", 8000.0).astype(np.float64)
(0.5 * sig.hilbert(audio)).astype(np.complex64).tofile("/tmp/ex11_rtty.cf32")
print(f"{len(audio)} RTTY IQ samples -> /tmp/ex11_rtty.cf32")
PYEOF
echo "== CLI DeRTTY =="
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex11_rtty.cf32 \
    -s 8000 -n 99999999 --demod DeRTTY -o /tmp/ex11 --blocksize 16384
cat /tmp/ex11.rtty.txt
