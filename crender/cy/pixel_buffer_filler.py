from cython3dmodelrenderer_tpu import (AdvancedPixelBufferFiller,
                                       EdgeOnlyPixelBufferFiller,
                                       PixelBufferFiller)

__all__ = ["PixelBufferFiller", "AdvancedPixelBufferFiller",
           "EdgeOnlyPixelBufferFiller"]
