"""qualityloader CLI — quality compression server.

Capability twin of /root/reference/src/bin/qualityload.rs:327-409:

    qualityloader -f <fastq> [-p port] [-w]

Loads the file's qualities, remaps to 3 bits, wavelet-compresses (-w is
accepted for parity; wavelet storage is the default here) and serves them
over the TCP request protocol (see quality/qserver.py) on port 4766 by
default.
"""

from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser(prog="qualityloader")
    p.add_argument("-f", "--file", required=True, dest="filename")
    p.add_argument("-p", "--port", type=int, default=4766)
    p.add_argument("-w", "--wavelet", action="store_true",
                   help="wavelet-matrix storage (default; flag kept for parity)")
    p.add_argument("--per-read", action="store_true",
                   help="one wavelet matrix per read (reference layout, "
                        "quality.rs:74-122) instead of the batched store")
    p.add_argument("--host", default="127.0.0.1")
    return p


def main(argv=None):
    from ..quality.quality import load_quality_store, load_quality_wm
    from ..quality.qserver import QualityServer

    args = build_parser().parse_args(argv)
    if args.per_read:
        qseqs = load_quality_wm(args.filename)
    else:
        qseqs = load_quality_store(args.filename)
    print(f"loaded {len(qseqs)} quality sequences from {args.filename}")
    server = QualityServer(qseqs, port=args.port, host=args.host)
    print(f"serving qualities on {args.host}:{server.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
