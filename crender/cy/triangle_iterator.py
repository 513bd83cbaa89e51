from cython3dmodelrenderer_tpu import (DepthIterator, SimpleIterator,
                                       TriangleIterator)

__all__ = ["TriangleIterator", "SimpleIterator", "DepthIterator"]
