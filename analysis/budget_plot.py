"""Budget-vs-mIoU ablation plot (reference: analysis/budget_plot.py).

Plots the published HALO GTAV->Cityscapes results (DeepLab-v3+/R101,
source+target protocol) against annotation budget, optionally overlaying
results parsed from one or more metrics.jsonl run logs produced by this
framework (pass SAVE_DIRs on the command line).
"""

import argparse
import json
import os

# Published HALO budget ablation (paper table; reference
# analysis/budget_plot.py:5-10).
BUDGETS = [0.1, 1.0, 2.2, 5.0, 10.0, 25.0, 50.0]
HALO_MIOU = [67.5, 72.9, 74.0, 74.5, 73.6, 72.9, 72.2]
FULLY_SUPERVISED = 71.9


def best_miou_from_log(save_dir):
    path = os.path.join(save_dir, "metrics.jsonl")
    best = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "mIoU" in rec:
                best = max(best or 0.0, rec["mIoU"])
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="*",
                    help="SAVE_DIRs with metrics.jsonl, as 'budget:dir'")
    ap.add_argument("--out", default="analysis/budget_plot.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5), constrained_layout=True)
    ax.plot(BUDGETS, HALO_MIOU, "o-", label="HALO (published)")
    ax.axhline(FULLY_SUPERVISED, ls="--", c="gray",
               label="fully supervised (71.9)")

    if args.runs:
        xs, ys = [], []
        for spec in args.runs:
            budget, d = spec.split(":", 1)
            miou = best_miou_from_log(d)
            if miou is not None:
                xs.append(float(budget))
                ys.append(miou)
        if xs:
            ax.plot(xs, ys, "s-", label="halo_tpu (this repo)")

    ax.set_xscale("log")
    ax.set_xticks(BUDGETS)
    ax.set_xticklabels([f"{b:g}%" for b in BUDGETS])
    ax.set_xlabel("annotation budget")
    ax.set_ylabel("mIoU (GTAV→Cityscapes)")
    ax.legend()
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
