"""End-to-end streaming benchmark: file → host feed → device graph → sinks.

This is the honest production number (bench.py measures device-resident
kernel throughput): it includes host→device transfer, the native IO runtime,
and per-channel file writes — the analogue of the reference's 20-channel
split workload (README.md:184-195: 1.6 MSPS real-time on CPU).

Usage: python benchmarks/bench_streaming.py [n_samples] [nch] [cu8] [decimK] [nodl]

``decimK`` (e.g. decim8) adds a per-channel audio decimator — the realistic
audio product (fs/nch/K per channel) and K× less device→host traffic, so a
representative end-to-end number is capturable in relay windows whose
downlink can't carry the full-rate variant.  The metric stays INPUT
samples/s either way (decimation reduces return traffic, not ingest).

``nodl`` is the DOWNLINK-FREE honest variant (round 3): the host feeds real
capture blocks (the input byte count is host-truth), the device reduces the
demodulated sink stream to a scalar checksum CHAINED across blocks (a full
sum — every audio element must be computed; the carried pipeline state and
the checksum chain make every dispatch data-dependent on the previous one),
and the timed region ends with a single 4-byte download of the checksum —
the completion proof the relay cannot fake (docs/TPU_BACKEND_NOTES.md).
This measures host→device→demod ingest throughput — the number that matches
the reference's "sustained ingest" figure (README.md:182-195) — in windows
whose return wire is too sick for the with-sinks variants (16 round-2
attempts never saw a healthy downlink).
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
    nodl = "nodl" in flags
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
        blk_sz = (1 << 23) if (cu8 and nodl) else (1 << 22) if cu8 else (1 << 21)
        pipe = cs.Pipeline(graph, block_size=blk_sz)

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

        if nodl:
            # downlink-free: on-device checksum instead of host sinks.  ONE
            # dispatch per block (the pipeline step); the checksum reduction
            # over every block's retained output runs once at the end — in
            # dispatch-stall windows (~1 s/dispatch regardless of size) the
            # per-block acc dispatch would otherwise double the stall bill.
            import jax
            import jax.numpy as jnp
            from csdr_tpu.core.runtime import rechunk

            if cu8:
                # the PRODUCTION u8 ingest path: interleaved rtl_sdr bytes
                # straight into the fused wide kernel (2 B/sample on the
                # wire, conversion in-kernel) — the same graph as the
                # composite Pipeline but one small fast-dispatch program
                from csdr_tpu.ops.pallas.flagship_fused_wide import (
                    flagship_fused_wide_init, flagship_fused_wide_step)
                from csdr_tpu.blocks.pallas_blocks import _interp_default
                from csdr_tpu.utils import autotune

                tF = autotune.lookup("flagship_fused_wide", nch, variant="u8")
                interp = _interp_default(False)
                kstate = flagship_fused_wide_init(nch)

                class _KPipe:
                    block_size = pipe.block_size

                    @staticmethod
                    def process_block(chunk_u8):
                        nonlocal kstate
                        kstate, audio = flagship_fused_wide_step(
                            kstate, jnp.asarray(chunk_u8), nch=nch, tileF=tF,
                            interpret=interp)
                        return audio

                pipe = _KPipe()

            def _acc_all(cs_ys):
                # FULL reduction over every block: every audio element feeds
                # the checksum, so no partial-output narrowing can skip
                # demod work; the descending weights keep it order-dependent
                tot = jnp.float32(0.0)
                for i, y in enumerate(cs_ys):
                    leaf = jax.tree.leaves(y)[0]
                    arr = leaf.ri if hasattr(leaf, "ri") else leaf
                    tot = tot * jnp.float32(0.5) + jnp.sum(arr)
                return tot

            acc_all = jax.jit(_acc_all)
            # dispatch-latency pre-measurement: two tiny chained dispatches
            # terminated by a download — records whether this sub-window is
            # in the ~1 s/dispatch stall regime (then the e2e number
            # measures the relay, not the framework)
            import jax as _jax
            import jax.numpy as _jnp

            _tiny = _jax.jit(lambda v: v * _jnp.float32(1.0000001) + 1.0)
            _v = _jnp.float32(1.0)
            _v = _tiny(_v)
            float(_jax.device_get(_v))
            _t = time.perf_counter()
            _v = _tiny(_tiny(_v))
            float(_jax.device_get(_v))
            dispatch_ms = (time.perf_counter() - _t) * 500.0
            # sustained-upload diagnostic: 4 back-to-back DISTINCT 16 MB
            # uploads — separates burst wire speed (the single-shot probe)
            # from the sustained regime the feed loop actually sees
            # (observed: 171 MB/s burst probe, ~6 MB/s sustained feed)
            _t = time.perf_counter()
            for _k in range(4):
                _b = _jax.device_put(
                    np.full(1 << 22, _k + 1, np.float32))
                _jax.block_until_ready(_b)
            sustained_up = 4 * (1 << 24) / (time.perf_counter() - _t) / 1e6
            # u8 flavor: the feed loop ships uint8 planes; if the relay's
            # u8 path is slower than f32, this shows it
            _t = time.perf_counter()
            for _k in range(4):
                _b = _jax.device_put(
                    np.full(1 << 24, _k + 7, np.uint8))
                _jax.block_until_ready(_b)
            sustained_up_u8 = 4 * (1 << 24) / (time.perf_counter() - _t) / 1e6
            # device-resident dispatch loop: 4 pipeline steps on an input
            # already on device — isolates the program dispatch path from
            # the host feed entirely.  COMPLEX-FREE: the cf32 flavor ships
            # encoded (n, 2) float planes (CEnc) — an eager complex
            # device_put wedges this TPU backend (docs/TPU_BACKEND_NOTES.md)
            from csdr_tpu.core.runtime import CEnc as _CEnc

            if cu8:
                _xd = _jax.device_put(np.full(pipe.block_size, 100, np.uint8))
            else:
                _xd = _CEnc(_jax.device_put(
                    np.zeros((pipe.block_size, 2), np.float32)))
            _jax.block_until_ready(_xd.ri if hasattr(_xd, "ri") else _xd)
            _w = pipe.process_block(_xd)       # compile + warm FIRST —
            _jax.block_until_ready(            # the first observed 3.2 s
                _jax.tree_util.tree_leaves(_w)[0].ri
                if hasattr(_jax.tree_util.tree_leaves(_w)[0], "ri")
                else _jax.tree_util.tree_leaves(_w)[0])
            _t = time.perf_counter()
            _ys = [pipe.process_block(_xd) for _ in range(4)]
            _probe = float(_jax.device_get(
                _jax.tree_util.tree_leaves(_ys[-1])[0].ri.reshape(-1)[0]
                if hasattr(_jax.tree_util.tree_leaves(_ys[-1])[0], "ri")
                else _jax.tree_util.tree_leaves(_ys[-1])[0].reshape(-1)[0]))
            resident_step_ms = (time.perf_counter() - _t) * 250.0
            del _ys

            ys = []
            total_in = 0
            host_bytes = 0
            t0 = time.perf_counter()
            for chunk in rechunk(src, pipe.block_size):
                total_in += len(chunk)        # host-truth sample count
                host_bytes += chunk.nbytes    # host-truth wire bytes
                if len(chunk) < pipe.block_size:
                    chunk = np.pad(chunk, (0, pipe.block_size - len(chunk)))
                ys.append(pipe.process_block(chunk))
            proof = float(jax.device_get(acc_all(ys)))  # forces EVERY block
            dt = time.perf_counter() - t0
            total = total_in
            if cu8:
                total_in //= 2                # u8 stream: 2 bytes per sample
                total = total_in
            n = total_in
            assert np.isfinite(proof)
        else:
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
        rec = {
            "metric": ("streaming_end_to_end_pfb64_fm"
                       + ("_cu8" if cu8 else "")
                       + (f"_decim{decim}" if decim > 1 else "")
                       + ("_nodl" if nodl else "")),
            "value": round(msps, 2),
            "unit": "Msamples/s",
            "native_io": native,
            "output_samples_per_channel": total,
            "wire_up_MBps": round(up_mbps, 1),
            "wire_down_MBps": round(down_mbps, 1),
            "vs_baseline": round(msps / 1.6, 2),  # reference real-time figure
        }
        if nodl:
            rec["sinks"] = ("on-device chained checksum, one 4-byte download "
                            "(downlink-free honest design)")
            rec["host_feed_MBps"] = round(host_bytes / dt / 1e6, 1)
            rec["dispatch_ms_before"] = round(dispatch_ms, 1)
            rec["sustained_up_MBps"] = round(sustained_up, 1)
            rec["sustained_up_u8_MBps"] = round(sustained_up_u8, 1)
            rec["resident_step_ms"] = round(resident_step_ms, 1)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
