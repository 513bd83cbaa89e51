from .buffer import Buffer
from .iterators import DepthIterator, SimpleIterator, TriangleIterator
from .model import Model, fit_model
from .obj_io import ObjData, load_obj

__all__ = ["Buffer", "Model", "fit_model", "ObjData", "load_obj",
           "TriangleIterator", "SimpleIterator", "DepthIterator"]
