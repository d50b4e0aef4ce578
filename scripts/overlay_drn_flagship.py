"""Overlay the DRN and flagship GraphMET resolution curves on a shared
validation set (VERDICT r4 #7: "a DRN-vs-flagship resolution overlay in
docs/").

Both ``.resolutions`` artifacts must be produced on the SAME events (use
``cli.evaluate --synthetic N`` with the same N for both checkpoints so
the seed-42 split matches).  Style follows plotting/resolution.py — the
CMS-convention figures the reference's plt.py draws (a parity contract,
reference plt.py:39-107).

    python scripts/overlay_drn_flagship.py \
        --flagship ckpts_syn/flagship_on_3000.resolutions \
        --drn ckpts_syn_drn/best.resolutions \
        --out docs/drn_vs_flagship.png
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--flagship", required=True)
    p.add_argument("--drn", required=True)
    p.add_argument("--out", default="docs/drn_vs_flagship.png")
    args = p.parse_args()

    from deepmetv2_tpu.plotting.resolution import _FIGURES
    from deepmetv2_tpu.utils import artifacts

    flag = artifacts.load(args.flagship)
    drn = artifacts.load(args.drn)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    try:
        import mplhep as hep
        plt.style.use(hep.style.CMS)
    except Exception:
        pass

    series = [
        ("MET", flag, "magenta", "GraphMET (flagship)"),
        ("MET", drn, "darkorange", "DRN direct-MET"),
        ("pfMET", flag, "black", "PF MET (baseline)"),
        ("puppiMET", flag, "red", "PUPPI MET (baseline)"),
    ]

    fig, axes = plt.subplots(1, 3, figsize=(21, 6))
    picks = [f for f in _FIGURES
             if f[0] in ("u_perp_resolution", "u_par_resolution", "R")]
    for ax, (key, _suffix, ylabel, ymax) in zip(axes, picks):
        for flavor, res, color, label in series:
            hists = res.get(flavor)
            if not hists or key not in hists:
                continue
            weights, edges = hists[key]
            ax.plot(edges[: len(weights)], weights, color=color, label=label)
        if key == "R":
            ax.axhline(y=1.0, color="black", linestyle="-.")
        ax.axis([0, 400, 0, ymax])
        ax.set_xlabel(r"$q_{T}$ [GeV]")
        ax.set_ylabel(ylabel)
        ax.legend(fontsize=12)
    fig.suptitle("DRN direct-MET vs flagship GraphMET — shared synthetic "
                 "validation set", fontsize=14)
    fig.savefig(args.out, bbox_inches="tight")
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
