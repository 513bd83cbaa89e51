"""Deferred shading pass — Lambert ("Guro") illumination over the G-buffer.

Reference semantics (``crender/{py,cy}/illumination/guro_illumination.py``):
the stored direction is the *negated, normalized* light direction; per pixel
``shadow = clip(dot(n, light) / (‖n‖ + 1e-6), 0, 1)`` and the color scales by
it. The compiled reference multiplies the float color buffer in place
(cy variant:23-27) — this implementation matches that float pipeline and runs
as a fused elementwise pass on device (part of the frame's single jit).
"""
from __future__ import annotations

from abc import abstractmethod

import jax
import jax.numpy as jnp
import numpy as np


def lambert_shade(color: jnp.ndarray, n_buffer: jnp.ndarray,
                  light: jnp.ndarray) -> jnp.ndarray:
    """The Lambert shading formula (reference guro_illumination.py:20-27).

    ``light`` is the pre-negated, normalized light direction. The single
    definition shared by every shading path (IlluminationDrawer.apply, the
    Renderer's fused shade+quantize dispatch, the multiview sweep).
    """
    dot = jnp.sum(n_buffer * light, axis=-1, keepdims=True)
    norm = jnp.linalg.norm(n_buffer, axis=-1, keepdims=True)
    shadow = jnp.clip(dot / (norm + 1e-6), 0.0, 1.0)
    return color * shadow


_lambert = jax.jit(lambert_shade)


@jax.jit
def lambert_to_u8(color, n_buffer, light):
    """Fused shade + uint8 quantize (the Renderer's final-image pass)."""
    return lambert_shade(color, n_buffer, light).astype(jnp.uint8)


@jax.jit
def cast_u8(color):
    return color.astype(jnp.uint8)


class IlluminationDrawer:
    """Abstract shading pass over (color, normal) G-buffers.

    ``apply`` is the functional device-side op; ``draw_illumination`` is the
    reference-compatible wrapper over ``Buffer`` objects
    (``illumination/illumination_drawer.py:5-13``).
    """

    @abstractmethod
    def apply(self, color: jnp.ndarray, n_buffer: jnp.ndarray) -> jnp.ndarray:
        ...

    def draw_illumination(self, color_buffer, n_buffer) -> None:
        from ..models.buffer import Buffer

        if isinstance(color_buffer, Buffer):
            shaded = self.apply(color_buffer.array.astype(jnp.float32),
                                n_buffer.array)
            color_buffer.array = shaded
        else:  # raw arrays, cy-renderer style
            return self.apply(jnp.asarray(color_buffer, dtype=jnp.float32),
                              jnp.asarray(n_buffer))


class NoIllumination(IlluminationDrawer):
    def apply(self, color: jnp.ndarray, n_buffer: jnp.ndarray) -> jnp.ndarray:
        return color


class GuroIllumination(IlluminationDrawer):
    def __init__(self, light_direction=[0, 0, 1]):  # noqa: B006 — reference API
        """Primitive Lambert illumination (reference guro_illumination.py:7-18).

        Parameters
        ----------
        light_direction : array of shape [3]
            Direction the light falls along; negated and normalized at
            construction so it aligns with camera-facing normals.
        """
        light = -np.asarray(light_direction, dtype="float32")
        self.light_direction = jnp.asarray(light / np.linalg.norm(light))

    def apply(self, color: jnp.ndarray, n_buffer: jnp.ndarray) -> jnp.ndarray:
        return _lambert(color, n_buffer, self.light_direction)
