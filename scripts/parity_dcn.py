"""DCN optimizer parity sweep — mirrors the reference's results table
(reference example/dcn/README.md:54-84: Adam lr=1e-3, Adagrad lr=1e-3/0.1,
GroupAdam lr=1e-3, GroupAdagrad lr=0.1) on the planted-logistic Criteo-like
stream (real Criteo-Kaggle is not redistributable into this environment;
set CRITEO_PATH to use the real TSV through the same code path).

Prints a markdown table of accuracy / AUC per config.
Usage: python scripts/parity_dcn.py [--cpu] [--train-batches 300]
"""
import argparse
import os
import subprocess
import sys
import re

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    ("TFPlus Adam (lr=0.001)", "adam", 0.001),
    ("TFPlus Adagrad (lr=0.001)", "adagrad", 0.001),
    ("TFPlus Adagrad (lr=0.1)", "adagrad", 0.1),
    ("TFPlus GroupAdam (lr=0.001)", "group_adam", 0.001),
    ("TFPlus GroupAdagrad (lr=0.1)", "sparse_group_ftrl", 0.1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train-batches", type=int, default=300)
    ap.add_argument("--eval-batches", type=int, default=25)
    args = ap.parse_args()

    rows = []
    for label, optname, lr in CONFIGS:
        cmd = [sys.executable, os.path.join(HERE, "..", "examples",
                                            "train_dcn.py"),
               "--optimizer", optname, "--lr", str(lr),
               "--train-batches", str(args.train_batches),
               "--eval-batches", str(args.eval_batches)]
        if args.cpu:
            cmd.append("--cpu")
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=1800).stdout
        m = re.search(r"eval accuracy: ([\d.]+) AUC: ([\d.]+)", out)
        acc, auc = (m.group(1), m.group(2)) if m else ("?", "?")
        rows.append((label, acc, auc))
        print(f"{label:34s} acc {acc}  AUC {auc}", flush=True)

    print("\n| Optimizer | Accuracy | AUC |")
    print("|---|---|---|")
    for label, acc, auc in rows:
        print(f"| {label} | {acc} | {auc} |")


if __name__ == "__main__":
    main()
