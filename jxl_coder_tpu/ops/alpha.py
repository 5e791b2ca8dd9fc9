"""Alpha association ops (jnp) — RGBAlpha.cpp:37-118 + ScanAlpha
equivalents (SURVEY.md §2.4 imagebit kernels)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def premultiply_u8(rgba: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) uint8 unassociated -> associated, rounding like the
    reference's 8-bit path ((v * a + 127) / 255)."""
    v = rgba.astype(jnp.uint32)
    a = v[..., 3:4]
    rgb = (v[..., :3] * a + 127) // 255
    return jnp.concatenate([rgb, v[..., 3:4]], axis=-1).astype(jnp.uint8)


@jax.jit
def unpremultiply_u8(rgba: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) uint8 associated -> unassociated ((v * 255 + a/2) / a)."""
    v = rgba.astype(jnp.uint32)
    a = v[..., 3:4]
    safe_a = jnp.maximum(a, 1)
    rgb = jnp.minimum((v[..., :3] * 255 + safe_a // 2) // safe_a, 255)
    rgb = jnp.where(a == 0, 0, rgb)
    return jnp.concatenate([rgb, v[..., 3:4]], axis=-1).astype(jnp.uint8)


@jax.jit
def premultiply_f(rgba: jnp.ndarray) -> jnp.ndarray:
    a = rgba[..., 3:4]
    return jnp.concatenate([rgba[..., :3] * a, a], axis=-1)


@jax.jit
def unpremultiply_f(rgba: jnp.ndarray) -> jnp.ndarray:
    a = rgba[..., 3:4]
    rgb = jnp.where(a > 0, rgba[..., :3] / jnp.maximum(a, 1e-9), 0.0)
    return jnp.concatenate([rgb, a], axis=-1)


def has_transparency(alpha: np.ndarray) -> bool:
    """ScanAlpha: does any pixel have non-opaque alpha."""
    return bool(np.any(alpha != np.iinfo(alpha.dtype).max)
                if alpha.dtype.kind == "u" else np.any(alpha < 1.0))
