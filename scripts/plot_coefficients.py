"""Plot Cd/Cl traces from forces_vs_time.csv files.

The script form of the reference's analysis notebook
(analysis/plot_coefficients.ipynb): load csv, trim warm-up rows, plot the
coefficient over time, save a PNG, print the windowed mean — plus Strouhal
extraction for shedding cases.

Usage:
  python scripts/plot_coefficients.py forces_vs_time.csv [Cd|Cl]
         [--skip N] [--out plot.png] [--strouhal U D]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from navierstokes_tpu.utils.analysis import (mean_coefficient,
                                             plot_coefficient, strouhal)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("name", nargs="?", default="Cd", choices=["Cd", "Cl",
                                                              "Drag", "Lift"])
    ap.add_argument("--skip", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--strouhal", nargs=2, type=float, metavar=("U", "D"),
                    help="also report St from the Cl trace")
    args = ap.parse_args(argv)

    out = args.out or f"{args.name}_over_time.png"
    mean = plot_coefficient(args.csv, args.name, skip_rows=args.skip,
                            out_png=out)
    print(f"mean {args.name} (rows {args.skip}..) = {mean:.6f} -> {out}")
    if args.strouhal:
        u, d = args.strouhal
        st = strouhal(args.csv, ref_length=d, u_mean=u)
        print(f"Strouhal = {st:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
