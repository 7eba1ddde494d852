"""Collect the per-encoding e2e mAP table from work_dirs/*/ap_*.csv.

Prints a markdown table (config, OBB mAP, HBB mAP) for ROUND3_NOTES.
"""

from __future__ import annotations

import csv
import glob
import os
import sys


def read_map(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for row in csv.reader(f):
            if row and row[0].strip().lower() == "map":
                return float(row[1])
    return None


def main():
    pats = sys.argv[1:] or ["work_dirs/dota_*_e2e"]
    rows = []
    for pat in pats:
        for d in sorted(glob.glob(pat)):
            name = os.path.basename(d)
            obb = read_map(os.path.join(d, "ap_obb.csv"))
            hbb = read_map(os.path.join(d, "ap_hbb.csv"))
            if obb is None and hbb is None:
                continue
            rows.append((name, obb, hbb))
    print("| config | OBB mAP@0.5 | HBB mAP@0.5 |")
    print("|---|---|---|")
    for name, obb, hbb in rows:
        o = f"{obb:.4f}" if obb is not None else "—"
        h = f"{hbb:.4f}" if hbb is not None else "—"
        print(f"| {name} | {o} | {h} |")


if __name__ == "__main__":
    main()
