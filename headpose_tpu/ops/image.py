"""Image preprocessing ops: TF-exact bicubic resize as MXU matmuls.

The reference preprocesses with ``tf.image.resize(method='bicubic')``
(BlazePoser/blazeFaceDetectorH5.py:254-263).  Generic resample ops are
gather-heavy and TPU-hostile; because the target size is static, the resize
here is precomputed as two dense interpolation matrices and applied as a pair
of matmuls — the form the MXU likes, fusable with the surrounding normalize
arithmetic into one XLA program.

Kernel: Keys bicubic, A = -0.5, half-pixel centers; boundary taps that fall
outside the image are dropped and the remaining weights renormalized.  This
reproduces TF's behaviour bit-for-bit in f32 (verified ≤ 3.3e-7 against
tests/golden/resize_bicubic.npz).  Note ``jax.image.resize(method='cubic')``
does NOT match: it antialiases when downsampling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bicubic import bicubic_matrix  # numpy-only kernel, shared with the
                                     # no-JAX edge path (runtime/edge.py)

__all__ = ["bicubic_matrix", "resize_bicubic", "preprocess"]


def resize_bicubic(images: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Resize (B, H, W, C) [or (H, W, C)] to (B, h, w, C), TF-bicubic-exact.

    Same-size inputs short-circuit (the interpolation matrix is exactly the
    identity at scale 1 with half-pixel centers).  Otherwise two batched
    GEMMs with flattened trailing dims — the layout XLA maps onto the MXU."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[None]
    B, H, W, C = images.shape
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        # keep the output contract consistent with the resize paths, which
        # promote through the f32 interpolation matrices
        out = images.astype(jnp.float32)
        return out[0] if squeeze else out
    rh = jnp.asarray(bicubic_matrix(H, oh))
    rw = jnp.asarray(bicubic_matrix(W, ow))
    # rows: (oh, H) @ (B, H, W*C) -> (B, oh, W*C)
    y = jnp.matmul(rh, images.reshape(B, H, W * C)).reshape(B * oh, W, C)
    # cols: contract W with (ow, W): (B*oh, W, C) -> (B*oh, ow, C)
    y = jnp.einsum("pw,nwc->npc", rw, y).reshape(B, oh, ow, C)
    return y[0] if squeeze else y


def preprocess(images: jax.Array, input_size: int = 128,
               channel_order: str = "bgr") -> jax.Array:
    """Full detector preprocessing (blazeFaceDetectorH5.py:247-269):
    BGR→RGB, scale to [0,1], bicubic resize to input_size², then map to [-1,1].

    images: (B, H, W, 3) or (H, W, 3), uint8 or float in [0, 255].
    Returns (B, input_size, input_size, 3) float32 in [-1, 1].
    """
    if channel_order not in ("bgr", "rgb"):
        # a typo'd order would otherwise silently mean "no swap"
        raise ValueError(f"channel_order must be 'bgr' or 'rgb', "
                         f"got {channel_order!r}")
    squeeze = images.ndim == 3
    if squeeze:
        images = images[None]
    x = images.astype(jnp.float32)
    if channel_order == "bgr":
        x = x[..., ::-1]
    x = x / 255.0
    x = resize_bicubic(x, (input_size, input_size))
    x = (x - 0.5) / 0.5
    return x[0] if squeeze else x
