"""Interactive pixel-coordinate picker (reference test_img_coor.py parity).

Left click prints/overlays (x, y); right click prints/overlays the BGR
value. Requires a display; on headless machines use --print_info to dump
image stats instead.
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--print_info", action="store_true")
    a = p.parse_args()

    img = cv2.imread(a.image, 1)
    assert img is not None, a.image
    if a.print_info or not os.environ.get("DISPLAY"):
        h, w = img.shape[:2]
        print(f"{a.image}: {w}x{h}, mean BGR {img.reshape(-1, 3).mean(0)}")
        if not a.print_info:
            print("no DISPLAY available; pass --print_info to silence this note")
        return

    def click_event(event, x, y, flags, params):
        font = cv2.FONT_HERSHEY_SIMPLEX
        if event == cv2.EVENT_LBUTTONDOWN:
            print(x, " ", y)
            cv2.putText(img, f"{x},{y}", (x, y), font, 1, (255, 0, 0), 2)
            cv2.imshow("image", img)
        if event == cv2.EVENT_RBUTTONDOWN:
            b, g, r = (int(v) for v in img[y, x])
            print(x, " ", y, " bgr:", b, g, r)
            cv2.putText(img, f"{b},{g},{r}", (x, y), font, 1, (255, 255, 0), 2)
            cv2.imshow("image", img)

    cv2.imshow("image", img)
    cv2.setMouseCallback("image", click_event)
    cv2.waitKey(0)


if __name__ == "__main__":
    main()
