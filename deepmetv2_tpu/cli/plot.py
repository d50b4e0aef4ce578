"""Resolution-curve plotting CLI — reference plt.py equivalent.

    python -m deepmetv2_tpu.cli.plot --ckpts ckpts --restore_file best

Reads ``<ckpts>/<restore_file>.resolutions`` (ours or the reference's) and
writes the five comparison PNGs next to it.
"""

from __future__ import annotations

import argparse

from deepmetv2_tpu.plotting import plot_resolutions
from deepmetv2_tpu.utils import artifacts


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--restore_file", default="best")
    p.add_argument("--ckpts", default="ckpts")
    args = p.parse_args(argv)

    res = artifacts.load(f"{args.ckpts}/{args.restore_file}.resolutions")
    written = plot_resolutions(res, f"{args.ckpts}/{args.restore_file}_")
    for w in written:
        print("wrote", w)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
