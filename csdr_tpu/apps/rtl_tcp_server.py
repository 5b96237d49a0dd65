"""Serve a capture file (or the synthetic device) as an rtl_tcp server.

The outbound half of the network-SDR story: the reference can only consume
local hardware (/root/reference/src/ComposableSDR/Source.chs:193-233); here a
recorded or synthesized stream becomes consumable by ANY rtl_tcp client on
the network — gqrx, SDR#, rtl_fm, or this framework's own ``--devname
rtl_tcp`` (io/rtl_tcp.RtlTcpSource).

    python -m csdr_tpu.apps.rtl_tcp_server --filename cap.cf32 --port 1234

Serves one client at a time, looping; ``--loop`` repeats the file per
connection, ``--clients N`` exits after N clients (0 = forever).
"""

from __future__ import annotations

import argparse
import time

from ..io.rtl_tcp import RtlTcpServer
from ..io import sources as SRC

__all__ = ["main"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rtl-tcp-server",
        description="Serve a capture or the synthetic device over rtl_tcp")
    p.add_argument("--filename", metavar="NAME",
                   help="Capture to serve (.cf32 complex64 or .cu8 raw u8 IQ)")
    p.add_argument("--devname", default=None, metavar="NAME",
                   help="SDR device to proxy instead of a file "
                        "(e.g. synthetic)")
    p.add_argument("-s", "--samplerate", type=float, default=2.4e6,
                   metavar="DOUBLE", help="Advertised/streamed sample rate")
    p.add_argument("--port", type=int, default=1234, metavar="INT",
                   help="TCP port (0 = ephemeral, printed on start)")
    p.add_argument("--host", default="127.0.0.1", metavar="ADDR")
    p.add_argument("--loop", action="store_true",
                   help="Repeat the file endlessly within one connection")
    p.add_argument("--clients", type=int, default=0, metavar="INT",
                   help="Exit after serving N clients (0 = run forever)")
    return p


def run_opts(opts) -> int:
    import os

    if not opts.filename and not opts.devname:
        print("need --filename or --devname")
        return 1
    if opts.filename and not os.path.exists(opts.filename):
        print(f"no such capture: {opts.filename}")
        return 1

    def make_source():
        if opts.filename:
            while True:
                if opts.filename.endswith(".cu8"):
                    yield from SRC.cu8_file_source(opts.filename)
                else:
                    yield from SRC.cf32_file_source(opts.filename)
                if not opts.loop:
                    return
        else:
            yield from SRC.open_sdr(opts.devname, opts.samplerate, 0.0, 0.0)

    srv = RtlTcpServer(make_source, host=opts.host, port=opts.port)
    print(f"rtl_tcp server on {srv.host}:{srv.port}", flush=True)
    try:
        while opts.clients == 0 or srv.clients_served < opts.clients:
            time.sleep(0.1)
    except KeyboardInterrupt:
        pass
    srv.close()
    print(f"served {srv.clients_served} client(s)")
    return 0


def main(argv=None) -> int:
    return run_opts(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
