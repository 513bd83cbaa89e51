"""Compat view of the reference's compiled tree (``crender/cy/``).

The reference's cy Renderer returns the raw float color ndarray (its caller
flips and casts — reference ``run.py:26``); this shim preserves that
contract: ``Renderer.render`` returns a host float32 (H, W, 3) array.
"""
import numpy as np

from cython3dmodelrenderer_tpu import Renderer as _Renderer
from cython3dmodelrenderer_tpu.fillers import AdvancedPixelBufferFiller

from . import data_structures, illumination, pixel_buffer_filler, \
    triangle_iterator


class Renderer(_Renderer):
    def render(self, model, normalize_model: bool = False,
               random_colors: bool = True):
        super().render(model, normalize_model=normalize_model,
                       random_colors=random_colors)
        if isinstance(self.pixel_buffer_filler, AdvancedPixelBufferFiller):
            filler = self.pixel_buffer_filler
            shaded = self.illumination.apply(filler.get_color_buffer(),
                                             filler.get_normals_buffer())
            return np.asarray(shaded)
        return np.asarray(self.color_buffer.array, dtype=np.float32)


__all__ = ["Renderer", "data_structures", "illumination",
           "pixel_buffer_filler", "triangle_iterator"]
