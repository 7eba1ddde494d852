"""Publish e2e results: BASELINE.json `published` + config docstrings.

The reference records every DOTA run's mAP in its config docstring
(e.g. configs/dota/dota_v002_theta_obb_r50_v1_train.py:2-8); this tool
applies the same convention to the e2e configs from the exported
work_dirs/<name>/ap_{obb,hbb}.csv, and mirrors the numbers into
BASELINE.json's `published` dict for the driver.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def read_map(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for row in csv.reader(f):
            if row and row[0].strip().lower() == "map":
                return float(row[1])
    return None


def results_from_workdirs(pattern="dota_*_e2e"):
    import glob
    out = {}
    for d in sorted(glob.glob(os.path.join(REPO, "work_dirs", pattern))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        obb = read_map(os.path.join(d, "ap_obb.csv"))
        hbb = read_map(os.path.join(d, "ap_hbb.csv"))
        if obb is None and hbb is None:
            continue
        out[name] = dict(obb_map=obb, hbb_map=hbb)
    return out


def stamp_config(name, res, protocol):
    path = os.path.join(REPO, "configs", f"{name}.py")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        src = f.read()
    header = (f'"""Results ({protocol}):\n'
              f'    OBB mAP@0.5: {res["obb_map"]:.4f}'
              f'    HBB mAP@0.5: {res["hbb_map"]:.4f}\n'
              f'(recorded by tools/publish_results.py — the reference\'s\n'
              f'config-docstring convention, '
              f'configs/dota/dota_v002_theta_obb_r50_v1_train.py:2-8)\n'
              f'"""\n')
    # replace a previous results docstring, else prepend
    if src.startswith('"""Results ('):
        src = header + src[src.index('"""\n', 3) + 4:]
    else:
        src = header + src
    with open(path, "w") as f:
        f.write(src)
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--protocol",
                   default="val scenes, synthetic devkit dota_e2e_xl, "
                           "R18@512 GN 12ep from scratch")
    p.add_argument("--no-stamp", action="store_true",
                   help="only update BASELINE.json")
    args = p.parse_args()

    res = results_from_workdirs()
    if not res:
        raise SystemExit("no ap_*.csv results under work_dirs/")
    baseline_path = os.path.join(REPO, "BASELINE.json")
    with open(baseline_path) as f:
        baseline = json.load(f)
    pub = baseline.setdefault("published", {})
    for name, r in sorted(res.items()):
        pub[name] = dict(r, protocol=args.protocol)
        print(f"{name}: OBB {r['obb_map']} HBB {r['hbb_map']}")
        if not args.no_stamp:
            stamp_config(name, r, args.protocol)
    with open(baseline_path, "w") as f:
        json.dump(baseline, f, indent=2)
    print(f"published {len(res)} rows -> BASELINE.json")


if __name__ == "__main__":
    main()
