from . import illumination, projection, raster_ref, transforms, wireframe

__all__ = ["illumination", "projection", "raster_ref", "transforms", "wireframe"]
