"""Image IO helpers."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def save_png(img: np.ndarray, path: Path) -> None:
    """img: [h, w, 3] float in [0,1] -> 8-bit PNG."""
    arr = np.asarray(img)
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
