from .image import save_png

__all__ = ["save_png"]
