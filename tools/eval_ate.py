"""TUM-format ATE evaluation CLI.

Parity with /root/reference/tools/eval_ate.py: timestamp association
(:35-65), Horn alignment (:68-100), RMSE/mean/median stats (:134-228),
trajectory plot. Works on TUM trajectory files
(``t tx ty tz qx qy qz qw`` per line) as produced by the SLAM runs.

Usage: python tools/eval_ate.py gt.txt est.txt [--plot out.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def read_tum(path):
    """-> dict timestamp -> [tx ty tz qx qy qz qw]."""
    data = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.replace(",", " ").split()]
            if len(vals) >= 8:
                data[vals[0]] = vals[1:8]
    return data


def associate(first, second, offset=0.0, max_difference=0.02):
    """Greedy closest-timestamp matching (ref eval_ate.py:35-65)."""
    first_keys = set(first.keys())
    second_keys = set(second.keys())
    potential = sorted(
        (abs(a - (b + offset)), a, b)
        for a in first_keys for b in second_keys
        if abs(a - (b + offset)) < max_difference)
    matches = []
    for _, a, b in potential:
        if a in first_keys and b in second_keys:
            first_keys.remove(a)
            second_keys.remove(b)
            matches.append((a, b))
    matches.sort()
    return matches


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("gt_file")
    parser.add_argument("est_file")
    parser.add_argument("--offset", type=float, default=0.0)
    parser.add_argument("--max_difference", type=float, default=0.02)
    parser.add_argument("--plot", type=str, default=None)
    args = parser.parse_args()

    from mipsfusion_tpu.eval.ate import evaluate_ate

    gt = read_tum(args.gt_file)
    est = read_tum(args.est_file)
    matches = associate(gt, est, args.offset, args.max_difference)
    if len(matches) < 2:
        sys.exit("not enough matched timestamps")

    gt_t = np.array([gt[a][:3] for a, _ in matches])
    est_t = np.array([est[b][:3] for _, b in matches])
    results = evaluate_ate(gt_t, est_t)
    for k, v in results.items():
        print(f"{k}: {v}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 7))
        ax.plot(gt_t[:, 0], gt_t[:, 2], "k-", label="ground truth")
        ax.plot(est_t[:, 0], est_t[:, 2], "b-", label="estimated")
        ax.legend(); ax.set_aspect("equal")
        ax.set_xlabel("x [m]"); ax.set_ylabel("z [m]")
        fig.savefig(args.plot, dpi=90, bbox_inches="tight")
        print(f"plot -> {args.plot}")


if __name__ == "__main__":
    main()
