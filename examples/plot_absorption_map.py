"""Render examples/absorption_map.py output as a heatmap figure.

Usage:  python examples/absorption_map.py [paper] > map.txt
        python examples/plot_absorption_map.py map.txt docs/absorption_map.png

The physics: A(E_dc, omega) < 0 marks THz gain windows, A > 0 absorption
(arXiv:1401.6047 Figs. 2-3) — a polarity field, so the encoding is a
diverging colormap anchored at A = 0 with a neutral midpoint; <v_dr>/v_p
is signed drift and gets the same treatment.  Matches the reference
workflow's gnuplot heatmaps over display-4 sweep output.
"""

import sys

import numpy as np


def parse(path):
    e_dc = omega = None
    rows_a, rows_v = [], []
    target = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith("# rows: E_dc ="):
                e_dc = np.array([float(x) for x in line.split("=")[1].split()])
            elif line.startswith("# cols: omega ="):
                omega = np.array([float(x) for x in line.split("=")[1].split()])
            elif line.startswith("# absorption"):
                target = rows_a
            elif line.startswith("# <v_dr>"):
                target = rows_v
            elif not line.startswith("#") and target is not None:
                target.append([float(x) for x in line.split()])
    if e_dc is None or omega is None or not rows_a or not rows_v:
        raise SystemExit(f"{path}: not an absorption_map.py output")
    return e_dc, omega, np.array(rows_a), np.array(rows_v)


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import TwoSlopeNorm

    e_dc, omega, A, v = parse(sys.argv[1])
    fig, axes = plt.subplots(1, 2, figsize=(9.2, 3.8), constrained_layout=True)
    panels = [(A, "absorption  A(E_dc, ω)"),
              (v, "drift  ⟨v_dr⟩/v_p")]
    extent = (omega[0], omega[-1], e_dc[0], e_dc[-1])
    for ax, (Z, title) in zip(axes, panels):
        lim = max(abs(float(Z.min())), abs(float(Z.max()))) or 1.0
        im = ax.imshow(Z, origin="lower", aspect="auto", extent=extent,
                       cmap="RdBu_r", norm=TwoSlopeNorm(0.0, -lim, lim),
                       interpolation="nearest")
        ax.set_title(title, fontsize=11)
        ax.set_xlabel("ω")
        ax.set_ylabel("E_dc")
        for s in ax.spines.values():
            s.set_color("#c0c0c0")
        ax.tick_params(colors="#606060", labelsize=9)
        cb = fig.colorbar(im, ax=ax, shrink=0.92)
        cb.outline.set_edgecolor("#c0c0c0")
        cb.ax.tick_params(colors="#606060", labelsize=8)
    fig.suptitle("Superlattice response over the (E_dc, ω) drive grid"
                 "  —  blue: gain (A<0) / negative drift",
                 fontsize=10, color="#404040")
    fig.savefig(sys.argv[2], dpi=150)
    print(f"wrote {sys.argv[2]}")


if __name__ == "__main__":
    main()
