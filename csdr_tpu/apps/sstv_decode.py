"""Offline SSTV decoder: .f32 audio (or .cf32 IQ via the built-in NBFM/USB
path is upstream's job) → RGB image as a binary PPM (P6) file.

Martin M1/M2, VIS auto-detect (models/sstv.py).  The device side (product
discriminator to instantaneous frequency) streams through the jitted
Pipeline; VIS/sync framing and fractional-sample scanline resampling run
host-side on the frequency track.

    python -m csdr_tpu.apps.sstv_decode audio.f32 -s 11025 -o image.ppm
    python -m csdr_tpu.apps.sstv_decode rec.f32 -s 11025 --mode martin2
"""

from __future__ import annotations

import argparse

import numpy as np

from ..core.runtime import Pipeline
from ..io.sinks import CollectSink
from ..io.sources import f32_file_source
from ..models import sstv

__all__ = ["main", "write_ppm"]


def write_ppm(path: str, image: np.ndarray) -> None:
    """Binary PPM (P6) — no-dependency RGB interchange."""
    h, w, _ = image.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(image, np.uint8).tobytes())


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sstv-decode",
        description="Decode an SSTV (Martin) image from an audio capture")
    p.add_argument("filename", metavar="FILE", help="input .f32 audio")
    p.add_argument("-s", "--samplerate", type=float, default=11025.0,
                   metavar="DOUBLE")
    p.add_argument("--mode", choices=[*sstv.MODES, "auto"], default="auto",
                   help="force a mode for headerless recordings")
    p.add_argument("-o", "--output", default=None, metavar="PPM",
                   help="output image path (default: FILE.ppm)")
    p.add_argument("--blocksize", type=int, default=1 << 17, metavar="INT")
    return p


def main(argv=None) -> int:
    opts = build_parser().parse_args(argv)
    try:
        rx = sstv.sstv_receiver(opts.samplerate)
    except ValueError as e:
        print(e)
        return 1
    sink = CollectSink()
    Pipeline(rx, block_size=opts.blocksize).run(
        f32_file_source(opts.filename), sink)
    mode = None if opts.mode == "auto" else opts.mode
    image, info = sstv.decode_freq(np.asarray(sink.concat()),
                                   opts.samplerate, mode)
    if info["lines"] == 0:
        print("no SSTV transmission found"
              + ("" if info["mode"] else " (no VIS; try --mode)"))
        return 1
    out = opts.output or (opts.filename.rsplit(".", 1)[0] + ".ppm")
    write_ppm(out, image)
    print(f"{info['mode']}: {info['lines']} line(s)"
          f"{' (VIS)' if info['vis_detected'] else ''} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
