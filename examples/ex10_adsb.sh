#!/bin/sh
# ADS-B: decode Mode S extended squitters (ident + even/odd CPR position +
# velocity) from a synthetic 2 MS/s 1090 MHz capture, via the main CLI's
# DeADSB flow AND the offline decoder app (capability extension; the
# reference's only decoder is the helicopter FSK telemetry app).
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
from csdr_tpu.models import adsb
fs = 2e6
icao, lat, lon = 0x4840D6, 52.25720, 3.91937
frames = [
    adsb.make_es_ident(icao, "KLM1023"),
    adsb.make_es_position(icao, lat, lon, 38000, odd=False),
    adsb.make_es_position(icao, lat, lon, 38000, odd=True),
    adsb.make_es_velocity(icao, 120.0, 209.0, vrate_fpm=640),
]
gap = np.zeros(80, np.float32)
mag = np.concatenate([gap] + sum(([adsb.adsb_modulate(f, fs), gap]
                                  for f in frames), []))
iq = adsb.to_iq(mag)
rng = np.random.default_rng(0)
iq = (iq + 0.02 * (rng.normal(size=len(iq))
                   + 1j * rng.normal(size=len(iq)))).astype(np.complex64)
iq.tofile("/tmp/ex10_adsb.cf32")
print(f"{len(iq)} IQ samples → /tmp/ex10_adsb.cf32")
PYEOF
echo "== CLI DeADSB =="
python -m csdr_tpu.apps.soapy_sdr_cli --filename /tmp/ex10_adsb.cf32 \
    -s 2e6 -n 2000 --demod DeADSB -o /tmp/ex10 --blocksize 4096
cat /tmp/ex10.adsb.txt
echo "== offline adsb_decode =="
python -m csdr_tpu.apps.adsb_decode /tmp/ex10_adsb.cf32 -s 2e6
