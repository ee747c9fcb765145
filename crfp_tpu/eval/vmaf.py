"""VMAF perceptual scoring harness (test_video_quality.sh parity).

The reference shells out to ffmpeg libvmaf after upscaling SR to 1280x720
(/root/reference/test_video_quality.sh:17-23). ffmpeg is not baked into
this image, so the harness is gated: it raises a clear error when the
binary is missing rather than silently skipping.
"""

from __future__ import annotations

import re
import shutil
import subprocess


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def vmaf_score(sr_video: str, gt_video: str, width: int = 1280, height: int = 720,
               fps: int = 24) -> float:
    """Returns the pooled VMAF mean of sr vs gt."""
    if not ffmpeg_available():
        raise RuntimeError(
            "ffmpeg (with libvmaf) is required for VMAF scoring but is not "
            "installed in this environment. Install ffmpeg or run "
            "test_video_quality.sh on a machine that has it."
        )
    cmd = [
        "ffmpeg", "-i", sr_video, "-i", gt_video,
        "-filter_complex",
        f"[0:v]scale={width}:{height}:flags=bicubic,fps={fps}[sr];"
        f"[1:v]scale={width}:{height}:flags=bicubic,fps={fps}[gt];"
        f"[sr][gt]libvmaf",
        "-f", "null", "-",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    m = re.search(r"VMAF score[:=]\s*([0-9.]+)", proc.stderr)
    if not m:
        raise RuntimeError(f"could not parse VMAF score from ffmpeg output:\n{proc.stderr[-2000:]}")
    return float(m.group(1))
