"""Sample sinks (reference layer L5, /root/reference/src/ComposableSDR/
Sink.hs): raw CF32/F32 writers, stdout, float WAV/AU audio, constellation-plot
Octave script.  Sinks are callables fed trimmed numpy pytrees by the runtime;
`close()` finalizes headers/footers (the runtime's bracketIO equivalent)."""

from __future__ import annotations

import os
import sys

import numpy as np

from . import wav as wavio

__all__ = [
    "RawFileSink", "StdoutSink", "AudioFileSink", "ConstellationPlotSink",
    "SpectrumPlotSink",
    "ChannelFileSinks", "NullSink", "CollectSink", "PlaybackSink", "TeeSink",
    "BranchSinks",
]


class SinkBase:
    def __call__(self, data):
        raise NotImplementedError

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RawFileSink(SinkBase):
    """Raw little-endian sample writer (.cf32 complex64 / .f32 float32) —
    reference fileSink (Sink.hs:29-34)."""

    def __init__(self, path: str):
        self.f = open(path, "wb")

    def __call__(self, data):
        np.asarray(data).tofile(self.f)

    def close(self):
        self.f.close()


class StdoutSink(SinkBase):
    """reference stdOutSink (Sink.hs:36-39)."""

    def __call__(self, data):
        sys.stdout.buffer.write(np.asarray(data).tobytes())

    def close(self):
        sys.stdout.buffer.flush()


class AudioFileSink(SinkBase):
    """Float WAV/AU writer (reference audioFileSink, Sink.hs:64-74).
    ``fmt`` in {"wav", "au"}; interleaves (n,) mono, (channels, n)
    runtime-layout blocks (what multi-channel graphs emit, e.g. the stereo
    decoder's ``jnp.stack([left, right])``), (n, channels) frames, or a
    tuple of per-channel arrays."""

    def __init__(self, path: str, sample_rate: int, channels: int = 1, fmt: str = "wav"):
        cls = wavio.WavWriter if fmt.lower() == "wav" else wavio.AuWriter
        ext = "." + fmt.lower()
        if not path.endswith(ext):
            path += ext
        self.w = cls(path, sample_rate, channels)
        self.channels = int(channels)
        self.path = path

    def __call__(self, data):
        if isinstance(data, tuple):
            data = np.stack([np.asarray(d) for d in data], axis=-1)
        data = np.asarray(data)
        if data.ndim == 2 and data.shape[0] == self.channels > 1:
            data = data.T  # (channels, n) runtime layout → interleaved frames
        self.w.write(data)

    def close(self):
        self.w.close()


class ConstellationPlotSink(SinkBase):
    """Emit a GNU Octave scatter-plot script of IQ samples (reference
    constellationPlotSink, Sink.hs:76-104)."""

    def __init__(self, path: str, max_points: int = 20000):
        self.f = open(path, "w")
        self.f.write("clear all; close all;\nv = [];\n")
        self.base = os.path.splitext(os.path.basename(path))[0]
        self.left = max_points

    def __call__(self, data):
        data = np.asarray(data).reshape(-1)
        take = data[: max(self.left, 0)]
        self.left -= len(take)
        for s in take:
            self.f.write(f"v(end+1) = {s.real:12.4e} + j*{s.imag:12.4e};\n")

    def close(self):
        self.f.write(
            "n = length(v);\n"
            "figure('color','white','position',[100 100 1200 400]);\n"
            "plot(real(v), imag(v), 'x', 'Color',[0 0.2 0.4]);\n"
            "xlabel('In-Phase');\nylabel('Quadrature');\ngrid on;\n"
            f'print -dpng -color "-S1200,600" {self.base}.png\n'
        )
        self.f.close()


class SpectrumPlotSink(SinkBase):
    """Welch-averaged power spectral density, emitted as a GNU Octave plot
    script — the spectral companion of ConstellationPlotSink (the reference
    has no PSD sink; its workflow inspects spectra in inspectrum/baudline,
    README.md:126-146 — this makes that eyeball step reproducible).

    Accumulates Hann-windowed periodograms over every chunk received
    (complex input → full-band spectrum, fftshifted; real input → same,
    spectrum is conjugate-symmetric).  close() writes the averaged spectrum
    in dB plus the plotting code."""

    def __init__(self, path: str, nfft: int = 1024, sample_rate: float = 1.0):
        self.f = open(path, "w")
        self.base = os.path.splitext(os.path.basename(path))[0]
        self.nfft = nfft
        self.fs = float(sample_rate)
        self.win = np.hanning(nfft).astype(np.float64)
        # 'spectrum' scaling (scipy.signal.welch convention): a unit tone
        # peaks at 0 dB regardless of nfft/window
        self.scale = 1.0 / (np.sum(self.win) ** 2 + 1e-30)
        self.acc = np.zeros(nfft, dtype=np.float64)
        self.count = 0
        self._tail = np.zeros(0, dtype=np.complex128)

    def __call__(self, data):
        x = np.asarray(data).reshape(-1).astype(np.complex128)
        x = np.concatenate([self._tail, x])
        nseg = len(x) // self.nfft
        if nseg:
            segs = x[: nseg * self.nfft].reshape(nseg, self.nfft) * self.win
            spec = np.fft.fft(segs, axis=1)
            self.acc += (np.abs(spec) ** 2).sum(axis=0) * self.scale
            self.count += nseg
        self._tail = x[nseg * self.nfft:]

    def close(self):
        psd = np.fft.fftshift(self.acc / max(self.count, 1))
        db = 10.0 * np.log10(psd + 1e-30)
        freqs = np.fft.fftshift(np.fft.fftfreq(self.nfft, d=1.0 / self.fs))
        self.f.write("clear all; close all;\n")
        self.f.write("f = [" + " ".join(f"{v:.6e}" for v in freqs) + "];\n")
        self.f.write("p = [" + " ".join(f"{v:.3f}" for v in db) + "];\n")
        self.f.write(
            "figure('color','white','position',[100 100 1200 400]);\n"
            "plot(f, p, 'Color',[0 0.2 0.4]);\n"
            "xlabel('Frequency [Hz]');\nylabel('PSD [dB]');\ngrid on;\n"
            f'print -dpng -color "-S1200,600" {self.base}.png\n'
        )
        self.f.close()


class TeeSink(SinkBase):
    """Fan one output stream into several sinks (the sink-side counterpart
    of core/block.Tee; reference distribute_ feeds one stream to many
    consumers the same way, Trans.hs:106-117)."""

    def __init__(self, *sinks):
        self.sinks = sinks

    def __call__(self, data):
        for s in self.sinks:
            s(data)

    def close(self):
        for s in self.sinks:
            s.close()


class BranchSinks(SinkBase):
    """Route a tuple-output graph (Tee — including multi-rate tees) to one
    sink per branch: element i of every output tuple goes to ``sinks[i]``.
    The structural counterpart of TeeSink (which copies ONE stream to many
    sinks); reference tee zips its branches into one array instead
    (Trans.hs:131-144) — here each branch keeps its own rate and file."""

    def __init__(self, *sinks):
        self.sinks = sinks

    def __call__(self, data):
        if not isinstance(data, tuple) or len(data) != len(self.sinks):
            raise TypeError(
                f"BranchSinks expects a {len(self.sinks)}-tuple per block, "
                f"got {type(data).__name__}")
        for s, d in zip(self.sinks, data):
            s(d)

    def close(self):
        for s in self.sinks:
            s.close()


class PlaybackSink(SinkBase):
    """Live audio playback through an external player's stdin — the
    reference's TODO "add live playback via PulseAudio"
    (/root/reference/README.md:302) and its documented workaround
    (README.md:160-165: ``mkfifo output.au && play output.au``), built in.

    Streams little-endian float32 PCM (interleaved for multi-channel) to the
    first player found — ``pacat`` (PulseAudio), ``aplay`` (ALSA), ``play``
    (sox) — or to an explicit ``command`` / ``$CSDR_PLAYER`` (shell-split;
    ``{rate}``/``{channels}`` are substituted).  Raises if no player exists;
    a dead player ends playback silently (like pulling headphones out
    mid-stream) rather than killing the capture."""

    _CANDIDATES = (
        "pacat --rate {rate} --channels {channels} --format float32le",
        "aplay -q -f FLOAT_LE -r {rate} -c {channels} -t raw -",
        "play -q -t raw -r {rate} -e floating-point -b 32 -c {channels} -",
    )

    def __init__(self, sample_rate: int, channels: int = 1,
                 command: str | None = None):
        import shlex
        import shutil
        import subprocess

        command = command or os.environ.get("CSDR_PLAYER")
        if command is None:
            for cand in self._CANDIDATES:
                if shutil.which(cand.split()[0]):
                    command = cand
                    break
            else:
                raise FileNotFoundError(
                    "no audio player found (tried pacat/aplay/play); install "
                    "one or set CSDR_PLAYER / pass command=")
        argv = [a.format(rate=int(sample_rate), channels=int(channels))
                for a in shlex.split(command)]
        self.proc = subprocess.Popen(argv, stdin=subprocess.PIPE)
        self.alive = True

    def __call__(self, data):
        if not self.alive:
            return
        a = np.asarray(data)
        if a.ndim == 2:  # (channels, n) runtime layout → interleaved frames
            a = a.T
        try:
            self.proc.stdin.write(np.ascontiguousarray(a, np.float32).tobytes())
        except (BrokenPipeError, OSError):
            self.alive = False

    def close(self):
        if self.proc.stdin and not self.proc.stdin.closed:
            try:
                self.proc.stdin.close()
            except (BrokenPipeError, OSError):
                pass
        self.proc.wait()


class ChannelFileSinks(SinkBase):
    """Fan a (nch, n) channelized block to per-channel sinks — the runtime
    equivalent of the reference's `distribute_ sinks`
    (apps/SoapySDR.hs:224-225: files named name_ch1..name_chN)."""

    def __init__(self, make_sink, nch: int):
        self.sinks = [make_sink(i) for i in range(nch)]

    def __call__(self, data):
        arr = np.asarray(data)
        for i, s in enumerate(self.sinks):
            s(arr[i])

    def close(self):
        for s in self.sinks:
            s.close()


class NullSink(SinkBase):
    def __init__(self):
        self.samples = 0

    def __call__(self, data):
        import jax

        for leaf in jax.tree.leaves(data):
            self.samples += np.asarray(leaf).shape[-1]


class CollectSink(SinkBase):
    """Accumulate outputs in memory (tests)."""

    def __init__(self):
        self.parts: list = []

    def __call__(self, data):
        self.parts.append(data)

    def concat(self):
        import jax

        if not self.parts:
            # nothing ever collected (a 0-sample run): the graph's output
            # STRUCTURE is unknown here, so this is a flat empty array even
            # for tuple-output graphs — consumers of structured outputs
            # must treat it as "no data" (e.g. models/adsb.decode_collected)
            return np.zeros(0)
        return jax.tree.map(lambda *xs: np.concatenate(xs, axis=-1), *self.parts)
