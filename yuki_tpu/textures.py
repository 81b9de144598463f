"""Texture evaluation: point-sampled gathers from a flat texel atlas.

The reference's ``Texture<T>`` trait (yuki/src/textures/mod.rs) collapses to
two cases on TPU: constants live directly in the material table
(scene/data.py), and image textures are rows of one [N,3] texel pool
gathered per lane.  Sampling semantics mirror ImageTexture::evaluate
(textures/image_texture.rs:85-106): repeat wrap, y-flip, point sample with
the -0.5 texel-center offset and Rust truncation-toward-zero cast.
"""

from __future__ import annotations

import numpy as np

from .gathers import SMALL_TABLE_ROWS, gather1d, rowgather
import jax.numpy as jnp


def eval_texture(atlas, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """tex_id [N] i32 (must be >=0, caller masks), uv [N,2] -> [N,3]."""
    k = atlas.offset.shape[0]
    if k <= SMALL_TABLE_ROWS:
        # ONE MXU row-fetch for all three descriptors (narrow scalar
        # gathers cost ~8 ns/lane EACH on this chip — three of them per
        # textured bounce were a top Cornell term).  The offset rides
        # exactly as a hi/lo f32 pair (see gathers.gather1d).
        desc = jnp.stack(
            [atlas.width.astype(jnp.float32),
             atlas.height.astype(jnp.float32),
             (atlas.offset >> 12).astype(jnp.float32),
             (atlas.offset & 0xFFF).astype(jnp.float32)], axis=1,
        )
        row = rowgather(desc, tex_id)
        w = row[..., 0].astype(jnp.int32)
        h = row[..., 1].astype(jnp.int32)
        off = row[..., 2].astype(jnp.int32) * 4096 + row[..., 3].astype(
            jnp.int32
        )
    else:
        w = gather1d(atlas.width, tex_id)
        h = gather1d(atlas.height, tex_id)
        off = gather1d(atlas.offset, tex_id)
    s = uv[..., 0] - jnp.floor(uv[..., 0])
    t = uv[..., 1] - jnp.floor(uv[..., 1])
    t = 1.0 - t
    x = s * w.astype(jnp.float32) - 0.5
    y = t * h.astype(jnp.float32) - 0.5
    # Rust `as usize` truncates toward zero and saturates negatives at 0.
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    return atlas.texels[off + yi * w + xi]


def decode_image_file(path: str) -> np.ndarray:
    """Decode an image file to linear-ish [h,w,3] float32 in [0,1].

    The reference decodes u8/u16/f32 RGB(A) without sRGB conversion
    (image_texture.rs:108-141 just scales integer samples to [0,1]);
    we match that: raw channel values / max."""
    from PIL import Image

    img = Image.open(path)
    mode = img.mode
    if mode not in ("RGB", "RGBA", "I;16", "F"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        out = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        out = arr.astype(np.float32) / 65535.0
    else:
        out = arr.astype(np.float32)
    if out.ndim == 2:
        out = np.repeat(out[..., None], 3, axis=2)
    return np.ascontiguousarray(out[..., :3])
