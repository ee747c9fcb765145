"""mp4 -> center-cropped PNG frames (reference gen_video.py parity)."""

import argparse

from crfp_tpu.tools.video import video_to_frames

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("video")
    p.add_argument("out_dir")
    p.add_argument("--crop_h", type=int, default=1080)
    p.add_argument("--crop_w", type=int, default=1920)
    a = p.parse_args()
    n = video_to_frames(a.video, a.out_dir, (a.crop_h, a.crop_w))
    print(f"wrote {n} frames to {a.out_dir}")
