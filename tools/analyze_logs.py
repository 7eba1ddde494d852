"""Training-log analysis (parity: reference tools/analyze_logs.py):
average iteration time + loss curves from the textual train log."""

from __future__ import annotations

import argparse
import ast
import os
import re
import sys

LINE_RE = re.compile(
    r"epoch (\d+) iter (\d+)/(\d+) ([\d.]+)s/it lr ([\d.e-]+) (\{.*\})")


def parse_log(path):
    rows = []
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if m:
                rows.append(dict(
                    epoch=int(m.group(1)), iter=int(m.group(2)),
                    sec_per_it=float(m.group(4)), lr=float(m.group(5)),
                    **ast.literal_eval(m.group(6))))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["cal_train_time", "plot_curve"])
    p.add_argument("logs", nargs="+")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    for path in args.logs:
        rows = parse_log(path)
        if not rows:
            print(f"{path}: no parseable rows")
            continue
        if args.task == "cal_train_time":
            # skip the first iter of each epoch (compile/warmup)
            times = [r["sec_per_it"] for r in rows if r["iter"] > 1]
            times = times or [r["sec_per_it"] for r in rows]
            print(f"{path}: {len(rows)} iters, "
                  f"avg {sum(times) / len(times):.4f} s/iter, "
                  f"slowest {max(times):.4f}, fastest {min(times):.4f}")
        else:
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
            except ImportError:
                for k in args.keys:
                    vals = [r.get(k) for r in rows if k in r]
                    print(f"{path} {k}: first={vals[0]:.4f} "
                          f"last={vals[-1]:.4f} min={min(vals):.4f}")
                continue
            plt.figure()  # fresh figure per log (no curve carry-over)
            for k in args.keys:
                vals = [r.get(k) for r in rows if k in r]
                plt.plot(range(len(vals)), vals, label=k)
            plt.legend()
            plt.xlabel("iteration")
            out = args.out or "curve.png"
            if args.out is None and len(args.logs) > 1:
                # distinct default name per log so multi-log runs
                # don't clobber one output file
                stem = os.path.splitext(os.path.basename(path))[0]
                out = f"curve_{stem}.png"
            plt.savefig(out)
            plt.close()
            print(f"saved {out}")


if __name__ == "__main__":
    main()
