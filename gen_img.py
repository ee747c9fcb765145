"""Paper-figure production: crop regions out of result frames and draw
highlight rectangles (generalized reference gen_img.py — the original
hard-codes per-figure coordinates in source; here they are CLI flags).

Usage:
  python gen_img.py FRAME.png --crop y,x,h,w --out crop.png
  python gen_img.py FRAME.png --rect y,x,h,w --color 51,153,255 --out lined.png
"""

from __future__ import annotations

import argparse

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--crop", type=str, default=None, help="y,x,h,w")
    p.add_argument("--rect", type=str, action="append", default=[], help="y,x,h,w (repeatable)")
    p.add_argument("--color", type=str, action="append", default=[], help="b,g,r per rect")
    p.add_argument("--thickness", type=int, default=3)
    p.add_argument("--out", required=True)
    a = p.parse_args()

    img = cv2.imread(a.image)
    assert img is not None, a.image
    for i, rect in enumerate(a.rect):
        y, x, h, w = (int(v) for v in rect.split(","))
        color = tuple(int(v) for v in a.color[i].split(",")) if i < len(a.color) else (51, 153, 255)
        cv2.rectangle(img, (x, y), (x + w, y + h), color, a.thickness)
    if a.crop:
        y, x, h, w = (int(v) for v in a.crop.split(","))
        img = img[y : y + h, x : x + w]
    cv2.imwrite(a.out, img)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
