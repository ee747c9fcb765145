"""PNG frames -> mp4 (reference png2mp4.py parity, default 20 fps)."""

import argparse

from crfp_tpu.tools.video import frames_to_mp4

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("frame_dir")
    p.add_argument("out")
    p.add_argument("--fps", type=int, default=20)
    a = p.parse_args()
    n = frames_to_mp4(a.frame_dir, a.out, a.fps)
    print(f"wrote {n} frames to {a.out}")
