"""Command-line interface: `brotli-tpu encode|decode <in> [<out>]`.

The packaging analog of the reference's npm subpath exports
(package.json:7-24, rolldown.config.js:3-27): encode-only and decode-only
entry points with per-call options, exposed as one console script.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="brotli-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="compress a file")
    pe.add_argument("infile")
    pe.add_argument("outfile", nargs="?", help="default: <infile>.br")
    pe.add_argument("-q", "--quality", type=int, default=11)
    pe.add_argument("--lgwin", type=int, default=None)
    pe.add_argument("--mode", type=int, default=0,
                    help="0=GENERIC 1=TEXT 2=FONT")
    pe.add_argument("--sharded", action="store_true",
                    help="TPU-throughput layout: one spliced stream of "
                         "shared-table chunks (device-decodable)")

    pd = sub.add_parser("decode", help="decompress a file")
    pd.add_argument("infile")
    pd.add_argument("outfile", nargs="?", help="default: strip .br")
    pd.add_argument("--max-output-size", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "encode":
        data = open(args.infile, "rb").read()
        if args.sharded:
            from .encode.sharded import encode_sharded_concat

            out = encode_sharded_concat(data)
        else:
            from .encode import encode

            out = encode(data, quality=args.quality, lgwin=args.lgwin,
                         mode=args.mode)
        outfile = args.outfile or args.infile + ".br"
        open(outfile, "wb").write(out)
        print(f"{len(data)} -> {len(out)} bytes ({outfile})", file=sys.stderr)
    else:
        from .decode import decode

        data = open(args.infile, "rb").read()
        out = decode(data, max_output_size=args.max_output_size)
        outfile = args.outfile or (
            args.infile[:-3] if args.infile.endswith(".br")
            else args.infile + ".out"
        )
        open(outfile, "wb").write(out)
        print(f"{len(data)} -> {len(out)} bytes ({outfile})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
