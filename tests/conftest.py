"""Test configuration: CPU backend with 8 virtual devices so the entire suite
(including the multi-chip sharding tests) runs anywhere, and a tiny
Blender-synthetic-format fixture generated from scratch so the full
parse -> rays -> render -> train path is testable offline.
"""

import json
import os
from pathlib import Path

# Must happen before the jax backend initializes.  JAX_PLATFORMS may be
# preset (e.g. to a TPU plugin) in the ambient environment, so override it
# both via env and via jax.config (env alone can be trumped by site hooks).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
from PIL import Image


def _make_synthetic_scene(root: Path, n_train: int = 2, n_test: int = 2, res: int = 64):
    """A miniature Blender-synthetic scene: cameras on a circle looking at the
    origin, images of a soft colored blob rendered analytically."""
    rng = np.random.default_rng(0)
    camera_angle_x = 0.6911112070083618

    def look_at_matrix(eye):
        eye = np.asarray(eye, dtype=np.float64)
        forward = eye / np.linalg.norm(eye)  # camera -z looks at origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        true_up = np.cross(forward, right)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, true_up, forward, eye
        return m

    def render_blob(cam, res):
        """Analytic image: alpha falls off with the ray's closest distance to a
        ball at the origin; color from the hit direction. RGBA uint8."""
        focal = res / (2.0 * np.tan(0.5 * camera_angle_x))
        xs = (np.arange(res) - res / 2.0 + 0.5) / focal
        ys = -(np.arange(res) - res / 2.0 + 0.5) / focal
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        dirs = np.stack([gx, gy, -np.ones_like(gx)], -1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = dirs @ cam[:3, :3].T
        o = cam[:3, 3]
        # closest approach of each ray to the origin
        t_close = -(dirs @ o)
        closest = o[None, None, :] + dirs * t_close[..., None]
        dist = np.linalg.norm(closest, axis=-1)
        alpha = np.clip(1.2 - dist / 0.8, 0.0, 1.0)
        rgb = 0.5 + 0.5 * dirs
        img = np.concatenate([rgb, alpha[..., None]], -1)
        return (img * 255).astype(np.uint8)

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
                {
                    "file_path": f"./{split}/r_{i}",
                    "transform_matrix": cam.tolist(),
                }
            )
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)


@pytest.fixture(scope="session")
def synthetic_scene(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("scene") / "blob"
    _make_synthetic_scene(root)
    return root


@pytest.fixture(scope="session")
def nerfstudio_scene(tmp_path_factory) -> Path:
    """A minimal nerfstudio-format scene reusing the synthetic generator."""
    root = tmp_path_factory.mktemp("ns_scene") / "capture"
    _make_synthetic_scene(root, n_train=9, n_test=0)
    # convert to nerfstudio transforms.json
    with open(root / "transforms_train.json") as f:
        meta = json.load(f)
    res = 64
    focal = res / (2.0 * np.tan(0.5 * meta["camera_angle_x"]))
    frames = [
        {
            "file_path": fr["file_path"].lstrip("./") + ".png",
            "transform_matrix": fr["transform_matrix"],
        }
        for fr in meta["frames"]
    ]
    ns = {
        "fl_x": focal,
        "fl_y": focal,
        "cx": res / 2.0,
        "cy": res / 2.0,
        "w": res,
        "h": res,
        "frames": frames,
    }
    with open(root / "transforms.json", "w") as f:
        json.dump(ns, f)
    return root
