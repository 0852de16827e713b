"""Image layout: concatenation with alignment, borders, resize.

Parity target: /root/reference/ggrt/visualization/layout.py (hcat/vcat
with start/center/end alignment, add_border, resize helpers), numpy/jnp
instead of torch. Images are channel-first (c, h, w) float in [0, 1].
"""
from __future__ import annotations

import jax.numpy as jnp


def _pad_to(image, h, w, align: str, value: float):
    c, ih, iw = image.shape
    dh, dw = h - ih, w - iw
    if align == "start":
        pads = ((0, 0), (0, dh), (0, dw))
    elif align == "end":
        pads = ((0, 0), (dh, 0), (dw, 0))
    else:  # center
        pads = ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2))
    return jnp.pad(image, pads, constant_values=value)


def _cat(images, axis: int, align: str, gap: int, gap_color: float):
    images = [jnp.asarray(im, jnp.float32) for im in images]
    c = images[0].shape[0]
    h = max(im.shape[1] for im in images)
    w = max(im.shape[2] for im in images)
    if axis == 2:  # hcat: equalize heights
        images = [_pad_to(im, h, im.shape[2], align, gap_color) for im in images]
        spacer = jnp.full((c, h, gap), gap_color, jnp.float32)
    else:  # vcat: equalize widths
        images = [_pad_to(im, im.shape[1], w, align, gap_color) for im in images]
        spacer = jnp.full((c, gap, w), gap_color, jnp.float32)
    parts = []
    for i, im in enumerate(images):
        if i and gap:
            parts.append(spacer)
        parts.append(im)
    return jnp.concatenate(parts, axis=axis)


def hcat(*images, align: str = "start", gap: int = 8, gap_color: float = 1.0):
    """Horizontal concat (ref layout.py hcat): align in {start,center,end}
    (aliases top/bottom accepted)."""
    align = {"top": "start", "bottom": "end"}.get(align, align)
    return _cat(images, 2, align, gap, gap_color)


def vcat(*images, align: str = "start", gap: int = 8, gap_color: float = 1.0):
    """Vertical concat (ref layout.py vcat); aliases left/right accepted."""
    align = {"left": "start", "right": "end"}.get(align, align)
    return _cat(images, 1, align, gap, gap_color)


def add_border(image, border: int = 8, color: float = 1.0):
    """Constant border around (c, h, w) (ref layout.py add_border)."""
    return jnp.pad(
        jnp.asarray(image, jnp.float32),
        ((0, 0), (border, border), (border, border)),
        constant_values=color,
    )


def resize(image, shape=None, width=None, height=None, method: str = "bilinear"):
    """Resize (c, h, w); exactly one of shape/width/height (ref layout.py
    resize semantics: a single dimension keeps aspect)."""
    import jax

    c, h, w = image.shape
    assert sum(x is not None for x in (shape, width, height)) == 1
    if width is not None:
        shape = (int(round(h * width / w)), width)
    elif height is not None:
        shape = (height, int(round(w * height / h)))
    return jax.image.resize(image, (c, *shape), method=method)
