"""Render the pvae replication grid (wrapped vs riemannian posterior)
as the science artifact the reference's `_9` scratchpad was reaching
for (/root/reference/scripts/_9_pvae_replicate.py:200-210): per-(c, d)
IWAE-5000 comparison and the riemannian-minus-wrapped delta.

Input: runs/pvae_replicate_r3/replicate_results.json (committed, 18
cells keyed "<posterior>_c<c>_d<d>" with best_val + iwae_5000).
Output: runs/pvae_replicate_r3/iwae_grid.png (two panels, one y-axis
each: absolute IWAE per cell for both posteriors, and the paired delta
around a zero baseline).

Usage: python experiments/pvae_grid_figure.py [--results PATH] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

CURVATURES = (0.5, 1.0, 1.4)
DIMS = (2, 5, 10)
# two categorical hues (fixed assignment: wrapped=blue, riemannian=orange)
C_WRAPPED = "#3B6EC5"
C_RIEMANN = "#D97A2B"
INK = "#333333"
MUTED = "#777777"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--results", default="runs/pvae_replicate_r3/replicate_results.json"
    )
    ap.add_argument("--out", default="runs/pvae_replicate_r3/iwae_grid.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    res = json.loads(Path(args.results).read_text())
    cells = [(c, d) for d in DIMS for c in CURVATURES]
    labels = [f"c={c}\nd={d}" for c, d in cells]
    wrapped = [res[f"wrapped_c{c}_d{d}"]["iwae_5000"] for c, d in cells]
    riemann = [res[f"riemannian_c{c}_d{d}"]["iwae_5000"] for c, d in cells]
    delta = [r - w for r, w in zip(riemann, wrapped)]

    fig, (ax0, ax1) = plt.subplots(
        2, 1, figsize=(9, 7), sharex=True, height_ratios=[3, 2]
    )
    xs = list(range(len(cells)))

    # panel 1: absolute IWAE-5000, dot pairs per cell (identity = hue)
    ax0.scatter(xs, wrapped, s=46, color=C_WRAPPED, label="WrappedNormal", zorder=3)
    ax0.scatter(
        xs, riemann, s=46, color=C_RIEMANN, label="RiemannianNormal",
        zorder=3, marker="D",
    )
    for x, w, r in zip(xs, wrapped, riemann):
        ax0.plot([x, x], [w, r], color=MUTED, lw=1, zorder=2)
    ax0.set_ylabel("IWAE-5000 log p(x) bound (nats)", color=INK)
    ax0.legend(frameon=False, loc="lower left")
    ax0.set_title(
        "pvae replication grid: posterior family per (curvature, latent dim)",
        color=INK, fontsize=11,
    )

    # panel 2: paired delta (polarity around 0 → diverging encoding)
    colors = [C_RIEMANN if v > 0 else C_WRAPPED for v in delta]
    ax1.bar(xs, delta, width=0.55, color=colors)
    ax1.axhline(0.0, color=INK, lw=1)
    for x, v in zip(xs, delta):
        if abs(v) > 2:  # long bar: label inside it, near the end
            ax1.annotate(
                f"{v:+.2f}", (x, v), textcoords="offset points",
                xytext=(0, 10 if v < 0 else -14), ha="center",
                fontsize=8, color="white",
            )
        else:
            ax1.annotate(
                f"{v:+.2f}", (x, v), textcoords="offset points",
                xytext=(0, 4 if v >= 0 else -12), ha="center",
                fontsize=8, color=INK,
            )
    ax1.set_ylabel("riemannian − wrapped (nats)\n↑ = riemannian better", color=INK)
    ax1.set_xticks(xs, labels)

    for ax in (ax0, ax1):
        ax.spines[["top", "right"]].set_visible(False)
        ax.grid(axis="y", color="#DDDDDD", lw=0.6, zorder=0)
        ax.set_axisbelow(True)
    # group separators between the d-blocks
    for ax in (ax0, ax1):
        for b in (2.5, 5.5):
            ax.axvline(b, color="#CCCCCC", lw=0.8, ls=":")

    fig.tight_layout()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=150)
    print("wrote", args.out)
    mean_d = sum(delta) / len(delta)
    worst = max(zip(delta, cells), key=lambda t: abs(t[0]))
    print(
        f"mean delta {mean_d:+.3f} nats; largest |delta| {worst[0]:+.2f} at "
        f"c={worst[1][0]} d={worst[1][1]}"
    )


if __name__ == "__main__":
    main()
