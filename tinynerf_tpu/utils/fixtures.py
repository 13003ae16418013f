"""Synthetic scene generation for tests/benchmarks.

Produces a miniature Blender-synthetic-format dataset (transforms_*.json +
RGBA PNGs) of an analytically-rendered soft colored blob, so the full
parse -> rays -> render -> train path can be exercised with no external
data (the reference bundles a 2-frame hotdog fixture for the same purpose;
this one is generated from scratch).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image

CAMERA_ANGLE_X = 0.6911112070083618


def look_at_matrix(eye: np.ndarray) -> np.ndarray:
    """Camera-to-world with -z looking from `eye` at the origin, z-up world."""
    eye = np.asarray(eye, dtype=np.float64)
    forward = eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, true_up, forward, eye
    return m


def render_blob(cam: np.ndarray, res: int) -> np.ndarray:
    """Analytic RGBA image: alpha falls off with each ray's closest distance
    to a ball at the origin; color from the hit direction."""
    focal = res / (2.0 * np.tan(0.5 * CAMERA_ANGLE_X))
    xs = (np.arange(res) - res / 2.0 + 0.5) / focal
    ys = -(np.arange(res) - res / 2.0 + 0.5) / focal
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    dirs = np.stack([gx, gy, -np.ones_like(gx)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ cam[:3, :3].T
    o = cam[:3, 3]
    t_close = -(dirs @ o)
    closest = o[None, None, :] + dirs * t_close[..., None]
    dist = np.linalg.norm(closest, axis=-1)
    alpha = np.clip(1.2 - dist / 0.8, 0.0, 1.0)
    rgb = 0.5 + 0.5 * dirs
    img = np.concatenate([rgb, alpha[..., None]], -1)
    return (img * 255).astype(np.uint8)


def make_synthetic_scene(
    root: Path, n_train: int = 2, n_test: int = 2, res: int = 64
) -> Path:
    """Write a Blender-synthetic-format scene under `root`."""
    root = Path(root)
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_test), ("test", n_test)):
        frames = []
        (root / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            theta = rng.uniform(0, 2 * np.pi)
            eye = 4.0 * np.array(
                [np.cos(theta), np.sin(theta), 0.5 + 0.2 * rng.uniform()]
            )
            cam = look_at_matrix(eye)
            img = render_blob(cam, res)
            Image.fromarray(img, "RGBA").save(root / split / f"r_{i}.png")
            frames.append(
                {"file_path": f"./{split}/r_{i}", "transform_matrix": cam.tolist()}
            )
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f)
    return root
