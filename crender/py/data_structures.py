from cython3dmodelrenderer_tpu import Buffer, Model

__all__ = ["Buffer", "Model"]
