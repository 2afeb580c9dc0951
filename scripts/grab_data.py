#!/usr/bin/env python3
"""Capture a monocular dataset from a Basler camera into EuRoC layout.

Behavior parity with the fork's capture tool
(/root/reference/Scripts/Data_Process/grab_data.py): grabs N frames over
pypylon, names each PNG by its nanosecond host timestamp under
<out>/mav0/cam0/data/, writes mav0/cam0/data.csv ("ts,filename", no header)
and an external one-stamp-per-line timestamps txt, so the result is directly
consumable by scripts/run_euroc_mono.py.

pypylon is optional hardware support and not part of this environment; the
script degrades to a clear error (or --fake for a synthetic capture used in
tests/smoke runs).

Usage:
  python scripts/grab_data.py <out_dir> [--num 1200] [--exposure-us 8000] \
      [--fake]
"""

import argparse
import os
import sys
import time


def write_index(out_dir):
    data_dir = os.path.join(out_dir, "mav0", "cam0", "data")
    rows = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(data_dir)
                  if f.endswith(".png"))
    csv_path = os.path.join(out_dir, "mav0", "cam0", "data.csv")
    with open(csv_path, "w") as f:
        for ts in rows:
            f.write(f"{ts},{ts}.png\n")
    name = os.path.basename(os.path.normpath(out_dir))
    ts_path = os.path.join(out_dir, f"{name}_timestamps.txt")
    with open(ts_path, "w") as f:
        for ts in rows:
            f.write(f"{ts}\n")
    print(f"indexed {len(rows)} frames -> {csv_path}, {ts_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--num", type=int, default=1200)
    ap.add_argument("--exposure-us", type=float, default=8000.0)
    ap.add_argument("--fake", action="store_true",
                    help="synthesize frames instead of using hardware")
    args = ap.parse_args()

    data_dir = os.path.join(args.out_dir, "mav0", "cam0", "data")
    os.makedirs(data_dir, exist_ok=True)

    import cv2
    import numpy as np

    if args.fake:
        rng = np.random.default_rng(0)
        for _ in range(args.num):
            ts = time.time_ns()
            img = rng.integers(0, 255, (480, 640), dtype=np.uint8)
            cv2.imwrite(os.path.join(data_dir, f"{ts}.png"), img)
        write_index(args.out_dir)
        return

    try:
        from pypylon import pylon
    except ImportError:
        sys.exit("pypylon is not installed (Basler capture needs camera "
                 "hardware + drivers); use --fake for a synthetic capture")

    camera = pylon.InstantCamera(
        pylon.TlFactory.GetInstance().CreateFirstDevice())
    camera.Open()
    try:
        camera.ExposureTime.SetValue(args.exposure_us)
    except Exception:
        pass
    camera.StartGrabbing(pylon.GrabStrategy_LatestImageOnly)
    converter = pylon.ImageFormatConverter()
    converter.OutputPixelFormat = pylon.PixelType_Mono8

    grabbed = 0
    while camera.IsGrabbing() and grabbed < args.num:
        res = camera.RetrieveResult(5000,
                                    pylon.TimeoutHandling_ThrowException)
        if res.GrabSucceeded():
            ts = time.time_ns()
            img = converter.Convert(res).GetArray()
            cv2.imwrite(os.path.join(data_dir, f"{ts}.png"), img)
            grabbed += 1
            if grabbed % 100 == 0:
                print(f"{grabbed}/{args.num}")
        res.Release()
    camera.StopGrabbing()
    camera.Close()
    write_index(args.out_dir)


if __name__ == "__main__":
    main()
