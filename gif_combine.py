"""Concatenate GIFs side by side (reference gif_combine.py parity)."""

import argparse

from crfp_tpu.tools.video import combine_gifs

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("gifs", nargs="+")
    p.add_argument("--out", required=True)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--axis", type=int, default=1)
    a = p.parse_args()
    combine_gifs(a.gifs, a.out, a.fps, a.axis)
    print(f"wrote {a.out}")
