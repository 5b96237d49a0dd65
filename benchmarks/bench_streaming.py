"""End-to-end streaming benchmark: file → host feed → device graph → sinks.

This is the honest production number (bench.py measures device-resident
kernel throughput): it includes host→device transfer, the native IO runtime,
and per-channel file writes — the analogue of the reference's 20-channel
split workload (README.md:184-195: 1.6 MSPS real-time on CPU).

Usage: python benchmarks/bench_streaming.py [n_samples] [nch] [cu8] [decimK]

``decimK`` (e.g. decim8) adds a per-channel audio decimator — the realistic
audio product (fs/nch/K per channel) and K× less device→host traffic, so a
representative end-to-end number is capturable in relay windows whose
downlink can't carry the full-rate variant.  The metric stays INPUT
samples/s either way (decimation reduces return traffic, not ingest).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import csdr_tpu as cs
    from csdr_tpu.models.receivers import channelized_fm_receiver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 25  # 33.5 MS
    nch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    flags = set(sys.argv[3:])
    cu8 = "cu8" in flags
    decim = next((int(a[5:]) for a in flags if a.startswith("decim")), 1)

    with tempfile.TemporaryDirectory() as td:
        cap = os.path.join(td, "cap.cu8" if cu8 else "cap.cf32")
        rng = np.random.default_rng(0)
        chunk = min(1 << 22, n)  # n below the writer chunk must not yield an
        n = (n // chunk) * chunk  # empty capture (a 0-block "benchmark")
        with open(cap, "wb") as f:
            t0 = 0
            for _ in range(n // chunk):
                t = np.arange(t0, t0 + chunk)
                x = (0.5 * np.exp(2j * np.pi * np.mod(0.1237 * t, 1.0))
                     + 0.05 * (rng.standard_normal(chunk) + 1j * rng.standard_normal(chunk)))
                if cu8:
                    u8 = np.empty(2 * chunk, dtype=np.uint8)
                    u8[0::2] = np.clip(np.round(x.real * 127.5 + 127.5), 0, 255)
                    u8[1::2] = np.clip(np.round(x.imag * 127.5 + 127.5), 0, 255)
                    u8.tofile(f)
                else:
                    x.astype(np.complex64).tofile(f)
                t0 += chunk

        from csdr_tpu.core.block import chain as _chain
        graph = channelized_fm_receiver(nch, kf=0.6, backend="pallas",
                                        audio_decim=decim)
        if cu8:
            # u8 over the host wire (2 B/sample instead of 8), converted on
            # device (blocks.u8_to_iq) before the fused receive chain
            graph = _chain(cs.u8_to_iq(), graph)
        pipe = cs.Pipeline(graph, block_size=(1 << 22) if cu8 else (1 << 21))

        try:
            from csdr_tpu.io.native import NativeRawFileSink as Sink
            from csdr_tpu.io.native import native_cf32_source
            native = True
        except Exception:
            Sink = cs.RawFileSink
            native = False

        if cu8:
            src = cs.cu8_file_source(cap, 1 << 21)
        elif native:
            src = native_cf32_source(cap, 1 << 20)
        else:
            src = cs.cf32_file_source(cap, 1 << 20)

        sink = cs.ChannelFileSinks(
            lambda i: Sink(os.path.join(td, f"out_ch{i + 1}.f32")), nch)

        t0 = time.perf_counter()
        total = pipe.run(src, sink)
        sink.close()
        dt = time.perf_counter() - t0

        # wire health: this environment's tunneled chip has an asymmetric,
        # time-varying relay (observed 582 MB/s up vs 0.7 MB/s down in a
        # degraded window) — record it so the e2e number is interpretable
        import jax

        t1 = time.perf_counter()
        d = jax.device_put(np.zeros(1 << 23, np.float32))
        jax.block_until_ready(d)
        up_mbps = (1 << 25) / (time.perf_counter() - t1) / 1e6
        t1 = time.perf_counter()
        np.asarray(d[: 1 << 21])
        down_mbps = (1 << 23) / (time.perf_counter() - t1) / 1e6

        msps = n / dt / 1e6
        print(json.dumps({
            "metric": ("streaming_end_to_end_pfb64_fm"
                       + ("_cu8" if cu8 else "")
                       + (f"_decim{decim}" if decim > 1 else "")),
            "value": round(msps, 2),
            "unit": "Msamples/s",
            "native_io": native,
            "output_samples_per_channel": total,
            "wire_up_MBps": round(up_mbps, 1),
            "wire_down_MBps": round(down_mbps, 1),
            "vs_baseline": round(msps / 1.6, 2),  # reference real-time figure
        }))


if __name__ == "__main__":
    main()
