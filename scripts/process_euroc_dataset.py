#!/usr/bin/env python3
"""Convert a directory of nanosecond-timestamp-named images into the
standard EuRoC dataset layout.

Behavior parity with the fork's dataset tool
(/root/reference/Scripts/Data_Process/process_euroc_dataset.py):
  1. ensure <dataset>/mav0/cam0/data exists (images live there),
  2. extract ns timestamps from filenames (e.g. 1621583823123456789.png),
  3. write mav0/cam0/data.csv lines "timestamp_ns,filename" (no header
     comment — the reference deliberately omits it),
  4. write an external timestamps .txt (one ns stamp per line) compatible
     with the EuRoC_TimeStamps files consumed by the runners,
  5. validate that every csv row's image exists and report gaps / fps.

Usage:
  python scripts/process_euroc_dataset.py <dataset_dir> \
      [--timestamps-out FILE] [--no-validate]
"""

import argparse
import os
import sys

SUPPORTED = {".png", ".jpg", ".jpeg", ".bmp", ".tiff"}


def scan_images(data_dir):
    names = []
    for fn in sorted(os.listdir(data_dir)):
        if os.path.splitext(fn.lower())[1] in SUPPORTED:
            names.append(fn)
    return names


def extract_stamps(names):
    rows, bad = [], []
    for fn in names:
        stem = os.path.splitext(fn)[0]
        try:
            rows.append((int(stem), fn))
        except ValueError:
            bad.append(fn)
    rows.sort()
    return rows, bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--timestamps-out", default=None,
                    help="external timestamps txt (default: "
                         "<dataset>/<name>_timestamps.txt)")
    ap.add_argument("--no-validate", action="store_true")
    args = ap.parse_args()

    data_dir = os.path.join(args.dataset, "mav0", "cam0", "data")
    os.makedirs(data_dir, exist_ok=True)
    names = scan_images(data_dir)
    if not names:
        sys.exit(f"no images found under {data_dir} — place ns-stamped "
                 "images there first")
    rows, bad = extract_stamps(names)
    if bad:
        print(f"warning: {len(bad)} filenames are not ns timestamps "
              f"(e.g. {bad[0]}); skipped")
    if not rows:
        sys.exit("no parsable timestamps")

    csv_path = os.path.join(args.dataset, "mav0", "cam0", "data.csv")
    with open(csv_path, "w") as f:
        for ts, fn in rows:
            f.write(f"{ts},{fn}\n")
    print(f"wrote {csv_path} ({len(rows)} rows)")

    ts_out = args.timestamps_out or os.path.join(
        args.dataset,
        os.path.basename(os.path.normpath(args.dataset)) + "_timestamps.txt")
    with open(ts_out, "w") as f:
        for ts, _ in rows:
            f.write(f"{ts}\n")
    print(f"wrote {ts_out}")

    span = (rows[-1][0] - rows[0][0]) / 1e9
    fps = (len(rows) - 1) / span if span > 0 else float("nan")
    print(f"{len(rows)} frames over {span:.2f}s (~{fps:.1f} fps)")

    if not args.no_validate:
        missing = [fn for _, fn in rows
                   if not os.path.exists(os.path.join(data_dir, fn))]
        if missing:
            sys.exit(f"validation FAILED: {len(missing)} csv rows have no "
                     f"image (e.g. {missing[0]})")
        import numpy as np
        stamps = np.array([ts for ts, _ in rows], np.float64)
        gaps = np.diff(stamps) / 1e9
        big = (gaps > 3.0 * np.median(gaps)).sum()
        if big:
            print(f"warning: {big} frame gaps exceed 3x the median interval")
        print("validation OK")


if __name__ == "__main__":
    main()
