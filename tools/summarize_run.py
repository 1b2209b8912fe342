"""Summarize a training run's metrics JSONL for docs / divergence study.

Reads <logdir>/train/metrics.jsonl (training/metrics.py format), prints:
  * a downsampled markdown table of the requested columns,
  * divergence events: steps where skipped_nonfinite fired, the max of
    max_log_s / actnorm_max_logs3 / |logdet| seen and where,
  * final-window averages.

Usage: python tools/summarize_run.py <logdir> [--cols a,b,c] [--rows N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

DEFAULT_COLS = ("loss", "logdet", "max_log_s", "logs_mean_sq",
                "actnorm_max_logs3", "grad_global_norm",
                "skipped_nonfinite")


def load(path: str) -> list[dict]:
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--cols", default=",".join(DEFAULT_COLS))
    p.add_argument("--rows", type=int, default=25)
    args = p.parse_args()

    path = os.path.join(args.logdir, "train", "metrics.jsonl")
    if not os.path.exists(path):
        path = args.logdir  # allow a direct file path
    recs = load(path)
    if not recs:
        sys.exit(f"no records in {path}")
    cols = [c for c in args.cols.split(",") if c in recs[-1]]

    print(f"{len(recs)} records, steps {recs[0]['step']}..."
          f"{recs[-1]['step']}\n")
    print("| step | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    stride = max(1, len(recs) // args.rows)
    shown = recs[::stride]
    if shown[-1] is not recs[-1]:
        shown.append(recs[-1])
    for r in shown:
        cells = []
        for c in cols:
            v = r.get(c)
            cells.append("-" if v is None else f"{v:.4g}")
        print(f"| {r['step']} | " + " | ".join(cells) + " |")

    skipped = [r["step"] for r in recs if r.get("skipped_nonfinite")]
    if skipped:
        print(f"\nskipped_nonfinite fired at {len(skipped)} summary "
              f"steps: first {skipped[0]}, last {skipped[-1]}")
    for c in ("max_log_s", "actnorm_max_logs3", "grad_global_norm"):
        vals = [(abs(r[c]), r["step"]) for r in recs if c in r
                and r[c] == r[c]]
        if vals:
            m, at = max(vals)
            print(f"max |{c}| = {m:.4g} at step {at}")
    tail = recs[-max(1, len(recs) // 10):]
    fin = [r["loss"] for r in tail if "loss" in r and r["loss"] == r["loss"]]
    if fin:
        print(f"final-window mean loss = {sum(fin)/len(fin):.4f} nats/dim "
              f"over last {len(tail)} records")


if __name__ == "__main__":
    main()
