"""Text annotation on images (host-side PIL, like the reference).

Parity target: /root/reference/ggrt/visualization/annotation.py
(add_label: white label bar above an image, draw_text). PIL only touches
tiny label strips; everything stays float (c, h, w) in [0, 1].
"""
from __future__ import annotations

import numpy as np

from .layout import vcat


def draw_text(text: str, width: int, height: int = 28, size: int = 14,
              color=(0.0, 0.0, 0.0), background: float = 1.0) -> np.ndarray:
    """Rasterize a text strip -> (3, height, width) float array."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGB", (width, height),
                    tuple(int(background * 255) for _ in range(3)))
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.load_default(size=size)
    except TypeError:  # older PIL: no size kwarg
        font = ImageFont.load_default()
    draw.text((4, max((height - size) // 2 - 2, 0)), text,
              fill=tuple(int(c * 255) for c in color), font=font)
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0


def add_label(image, label: str, font_size: int = 14):
    """Stack a text label above a (3, h, w) image (ref annotation.add_label)."""
    import jax.numpy as jnp

    image = jnp.asarray(image, jnp.float32)
    strip = draw_text(label, width=image.shape[2], size=font_size)
    return vcat(jnp.asarray(strip), image, gap=0)
