"""Host I/O: image readers."""

from .ppm import PPMImage, read_ppm, read_ppm_bytes

__all__ = ["PPMImage", "read_ppm", "read_ppm_bytes"]
