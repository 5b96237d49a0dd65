#!/bin/sh
# Packet radio: decode AIS position reports and an APRS beacon from
# synthetic GMSK / AFSK1200 captures (capability extensions; the reference's
# only decoder is the helicopter FSK telemetry app).
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
from csdr_tpu.models import ais, aprs
fs = 48000
k = fs // 9600
idle = np.array([0, 1] * 60, np.uint8)
lv = np.concatenate([idle,
    ais.ais_burst_bits(ais.make_position_report(257123456, 59.91234, 10.75321, 14.2, 83.1)),
    idle,
    ais.ais_burst_bits(ais.make_position_report(366998410, -33.85678, 151.21543, 0.3, 201.5, msg_type=3)),
    idle])
ais.ais_modulate(lv, k).astype(np.complex64).tofile("/tmp/ex9_ais.cf32")

frame = aprs.make_ax25_ui("N0CALL-7", "APRS", "!4903.50N/07201.75W-TPU radio",
                          via=("WIDE1-1",))
mark = np.ones(120, np.uint8)
lv2 = np.concatenate([mark, aprs.aprs_burst_bits(frame), mark])
aprs.afsk_modulate(lv2, fs).tofile("/tmp/ex9_aprs.f32")
PYEOF
echo "== AIS =="
python -m csdr_tpu.apps.ais_decode /tmp/ex9_ais.cf32 -s 48000
echo "== APRS =="
python -m csdr_tpu.apps.aprs_decode /tmp/ex9_aprs.f32 -s 48000
