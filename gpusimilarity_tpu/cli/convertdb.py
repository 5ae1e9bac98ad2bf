"""Convert fingerprint databases between the ``.fsim`` interchange format and
the native memory-mappable ``.tfsim`` directory format."""

from __future__ import annotations

import argparse
import sys

from ..utils.tfsim import convert, load_any


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert between .fsim (reference-compatible, compressed) "
        "and .tfsim (native, memory-mappable) fingerprint databases."
    )
    parser.add_argument("src", help="input .fsim file or .tfsim directory")
    parser.add_argument("dst", help="output path; extension picks the format")
    args = parser.parse_args(argv)
    convert(args.src, args.dst)
    data = load_any(args.dst)
    print(
        f"Wrote {args.dst}: {data.count} compounds, {data.bitcount} bits, "
        f"dbkey={data.dbkey!r}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
