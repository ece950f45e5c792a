"""Video post-statistics: last frame + temporal average per output mp4.

Parity target: reference src/analysis/rans_calc.py -- walk the vis/
directories, extract the final frame and the mean-over-time frame of each
video as PNGs (a cheap RANS-style time average), skipping already-processed
files.

Usage:
  python -m lbm2d_tpu.analysis.video_stats --root outputs [--overwrite]
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def process_video(mp4_path: str, overwrite: bool = False) -> Optional[Tuple[str, str]]:
    """Write <stem>_last.png and <stem>_avg.png next to the video."""
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable")
    stem = os.path.splitext(mp4_path)[0]
    last_png = stem + "_last.png"
    avg_png = stem + "_avg.png"
    if not overwrite and os.path.exists(last_png) and os.path.exists(avg_png):
        return None

    cap = cv2.VideoCapture(mp4_path)
    if not cap.isOpened():
        return None
    acc = None
    count = 0
    last = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        last = frame
        acc = frame.astype(np.float64) if acc is None else acc + frame
        count += 1
    cap.release()
    if last is None or count == 0:
        return None
    cv2.imwrite(last_png, last)
    cv2.imwrite(avg_png, (acc / count).astype(np.uint8))
    return last_png, avg_png


def walk_and_process(root: str, overwrite: bool = False) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        for fname in files:
            if fname.endswith(".mp4"):
                if process_video(os.path.join(dirpath, fname), overwrite):
                    n += 1
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="outputs")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()
    n = walk_and_process(args.root, args.overwrite)
    print(f"[Done] processed {n} videos under {args.root}")


if __name__ == "__main__":
    main()
