"""Video/frame/GIF production tools (gen_video.py, png2mp4.py,
gif_combine.py parity) plus Middlebury optical-flow rendering.

- ``video_to_frames``: mp4 -> PNG frames with center-crop to a target size
  (/root/reference/gen_video.py:7-47).
- ``frames_to_mp4``: PNG -> mp4 at a given fps via cv2
  (/root/reference/png2mp4.py:8-53).
- ``frames_to_gif`` / ``combine_gifs``: GIF export used by the demo paths
  (/root/reference/test_video.py:478-526, gif_combine.py).
- ``flow_to_color``: Middlebury color-wheel flow visualization
  (/root/reference/utils.py:339-451).
"""

from __future__ import annotations

import os

import numpy as np


def video_to_frames(video_path: str, out_dir: str, crop_hw: tuple[int, int] | None = (1080, 1920)):
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if crop_hw is not None:
            h, w = frame.shape[:2]
            ch, cw = crop_hw
            y0 = max((h - ch) // 2, 0)
            x0 = max((w - cw) // 2, 0)
            frame = frame[y0 : y0 + ch, x0 : x0 + cw]
        cv2.imwrite(os.path.join(out_dir, f"{n:08d}.png"), frame)
        n += 1
    cap.release()
    return n


def frames_to_mp4(frame_dir: str, out_path: str, fps: int = 20):
    import cv2

    files = sorted(
        os.path.join(frame_dir, f) for f in os.listdir(frame_dir) if f.endswith(".png")
    )
    assert files, frame_dir
    first = cv2.imread(files[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in files:
        writer.write(cv2.imread(f))
    writer.release()
    return len(files)


def frames_to_gif(frames: list[np.ndarray], out_path: str, fps: int = 7):
    """frames: list of (H, W, 3) uint8 RGB arrays."""
    import imageio

    with imageio.get_writer(out_path, mode="I", fps=fps) as writer:
        for f in frames:
            writer.append_data(f)


def combine_gifs(paths: list[str], out_path: str, fps: int = 7, axis: int = 1):
    """Concatenate GIFs side by side (gif_combine.py parity)."""
    import imageio

    readers = [imageio.get_reader(p) for p in paths]
    frames = [list(r) for r in readers]
    n = min(len(f) for f in frames)
    with imageio.get_writer(out_path, mode="I", fps=fps) as writer:
        for i in range(n):
            row = [np.asarray(f[i])[..., :3] for f in frames]
            hmin = min(r.shape[0] for r in row)
            row = [r[:hmin] for r in row]
            writer.append_data(np.concatenate(row, axis=axis))


def result_comp(left: np.ndarray, right: np.ndarray, split_x: int) -> np.ndarray:
    """Side-by-side comparison frame: left image up to column split_x, right
    image after, with a white separator column (reference trainer.py
    result_comp). Inputs (H, W, 3) uint8."""
    out = right.copy()
    out[:, :split_x] = left[:, :split_x]
    out[:, split_x] = 255
    return out


def _make_colorwheel() -> np.ndarray:
    """Baker et al. ICCV'07 color wheel (utils.py:339-383)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(0, RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(0, YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(0, GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(0, BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


def flow_to_color(flow: np.ndarray, clip_flow: float | None = None) -> np.ndarray:
    """(H, W, 2) flow (dx, dy) -> (H, W, 3) uint8 visualization."""
    u, v = flow[..., 0].astype(np.float64), flow[..., 1].astype(np.float64)
    if clip_flow is not None:
        u = np.clip(u, -clip_flow, clip_flow)
        v = np.clip(v, -clip_flow, clip_flow)
    rad = np.sqrt(u**2 + v**2)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u**2 + v**2)

    wheel = _make_colorwheel()
    ncols = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros((*u.shape, 3), np.uint8)
    for i in range(3):
        col0 = wheel[k0, i] / 255.0
        col1 = wheel[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., i] = np.floor(255 * col)
    return img
