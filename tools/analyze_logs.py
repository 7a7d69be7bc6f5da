#!/usr/bin/env python
"""Training-log analysis (reference `tools/analysis_tools/analyze_logs.py`):
compute time stats and loss curves from the JSON-line train logs.

    python tools/analyze_logs.py cal_train_time work_dirs/run/train_log.jsonl
    python tools/analyze_logs.py plot_curve work_dirs/run/train_log.jsonl \
        --keys loss loss_cls --out curve.png
"""
import argparse
import json

import numpy as np


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            recs.append(json.loads(line))
    return recs


def cal_train_time(recs):
    times = [r["time"] for r in recs if "time" in r]
    if not times:
        print("no iteration timing records")
        return
    t = np.array(times)
    print(f"average iter time: {t.mean():.4f} s/iter")
    print(f"slowest: {t.max():.4f}  fastest: {t.min():.4f}  std: {t.std():.4f}")
    epochs = sorted({r["epoch"] for r in recs if "epoch_time" in r})
    for e in epochs:
        et = [r["epoch_time"] for r in recs if r.get("epoch") == e and "epoch_time" in r]
        if et:
            print(f"epoch {e}: {et[0]:.1f} s")


def plot_curve(recs, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, series = [], {k: [] for k in keys}
    i = 0
    for r in recs:
        if "iter" in r and all(k in r for k in keys):
            i += 1
            steps.append(i)
            for k in keys:
                series[k].append(r[k])
    for k in keys:
        plt.plot(steps, series[k], label=k)
    plt.xlabel("log step")
    plt.legend()
    plt.savefig(out, dpi=120)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["cal_train_time", "plot_curve"])
    ap.add_argument("log")
    ap.add_argument("--keys", nargs="+", default=["loss"])
    ap.add_argument("--out", default="curve.png")
    args = ap.parse_args()
    recs = load(args.log)
    if args.task == "cal_train_time":
        cal_train_time(recs)
    else:
        plot_curve(recs, args.keys, args.out)


if __name__ == "__main__":
    main()
