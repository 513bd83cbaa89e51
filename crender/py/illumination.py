from cython3dmodelrenderer_tpu import (GuroIllumination, IlluminationDrawer,
                                       NoIllumination)

__all__ = ["IlluminationDrawer", "NoIllumination", "GuroIllumination"]
