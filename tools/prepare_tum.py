#!/usr/bin/env python
"""Convert a raw TUM RGB-D download into the layout this framework reads.

The reference consumes a pre-associated directory: ``ground_truth.txt``
lines ``stamp tx ty tz qx qy qz qw`` with the matching depth frame at
``depth/<stamp>.png`` (ref: src/DataLoader/TUMDataLoader.cpp:111-128,
README.md:63-78). A raw TUM sequence (e.g. rgbd_dataset_freiburg1_xyz)
instead ships ``groundtruth.txt`` (ground truth at 100 Hz) and
``depth.txt`` (depth index at 30 Hz) with *different* timestamps. This
tool does the standard nearest-timestamp association and writes the
associated layout (symlinks by default; ``--copy`` to materialise).

Usage:
  python tools/prepare_tum.py <raw_sequence_dir> <out_dir> \
      [--max-dt 0.02] [--frames N] [--copy]
"""

from __future__ import annotations

import argparse
import os
import shutil


def read_index(path: str) -> list[tuple[float, list[str]]]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            rows.append((float(parts[0]), parts[1:]))
    return rows


def associate(depth_rows, gt_rows, max_dt: float):
    """Nearest ground-truth pose for each depth frame within max_dt s."""
    out = []
    gi = 0
    for t, (rel_path, *_rest) in [(t, r) for t, r in depth_rows]:
        while gi + 1 < len(gt_rows) and abs(gt_rows[gi + 1][0] - t) <= abs(
            gt_rows[gi][0] - t
        ):
            gi += 1
        if abs(gt_rows[gi][0] - t) <= max_dt:
            out.append((t, rel_path, gt_rows[gi][1]))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("raw_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--max-dt", type=float, default=0.02,
                    help="max |depth - groundtruth| timestamp gap (s)")
    ap.add_argument("--frames", type=int, default=0,
                    help="keep only the first N associated frames")
    ap.add_argument("--copy", action="store_true",
                    help="copy PNGs instead of symlinking")
    args = ap.parse_args(argv)

    depth_rows = read_index(os.path.join(args.raw_dir, "depth.txt"))
    gt_rows = read_index(os.path.join(args.raw_dir, "groundtruth.txt"))
    assoc = associate(depth_rows, gt_rows, args.max_dt)
    if args.frames:
        assoc = assoc[: args.frames]
    if not assoc:
        raise SystemExit("no frames associated; raise --max-dt?")

    os.makedirs(os.path.join(args.out_dir, "depth"), exist_ok=True)
    with open(os.path.join(args.out_dir, "ground_truth.txt"), "w") as f:
        for t, rel, pose in assoc:
            stamp = f"{t:.6f}"
            src = os.path.abspath(os.path.join(args.raw_dir, rel))
            dst = os.path.join(args.out_dir, "depth", f"{stamp}.png")
            if os.path.lexists(dst):
                os.remove(dst)
            (shutil.copyfile if args.copy else os.symlink)(src, dst)
            f.write(stamp + " " + " ".join(pose[:7]) + "\n")
    print(f"associated {len(assoc)} frames -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
