from .fixtures import make_shell_occupancy, make_synthetic_scene
from .image import save_png

__all__ = ["save_png", "make_shell_occupancy", "make_synthetic_scene"]
