"""Fused on-device image preprocessing.

The reference runs its whole augmentation pipeline on CPU inside DataLoader
workers, image by image (utils/transforms.py:14-348; per-image ColorJitter
loop :315-320). Here the entire train pipeline
    resize -> random-shift -> scale -> color-jitter -> normalize
is a single jitted, batch-level, PRNG-key-driven function executed on the TPU
next to the model — uint8 frames travel over PCIe/DCN, float math happens at
HBM bandwidth and fuses into the encoder's first conv.

Semantics notes (parity with the reference pipeline,
config/datamodule/transform_manager/transforms/rl_train.yaml:1-30):
  * RandomShiftsAug (DrQ) pads by `pad` with edge replication then samples an
    integer shift in [0, 2*pad] per image; the grid_sample construction in the
    reference lands exactly on pixel centers, i.e. it IS an integer
    translation — implemented here as a dynamic slice of the padded image.
  * ColorJitter follows torchvision: brightness/contrast factors ~
    U[max(0,1-v), 1+v], hue offset ~ U[-h, h], ops applied in a random order
    per image; the reference applies the jitter with probability `prob`.
  * The shift runs on 0..255 floats BEFORE scaling (pipeline order above), so
    shifted-in zeros are black, exactly like the reference.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "resize_bilinear",
    "resize_shift",
    "random_shift",
    "color_jitter",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "augment_rgb_train",
    "augment_rgb_eval",
    "augment_depth_train",
    "augment_depth_eval",
    "normalize",
    "scale_depth",
    "colorize_depth",
]


def _interp_matrix(in_size: int, out_size: int):
    """(out, in) bilinear interpolation matrix with torchvision tensor-mode
    Resize semantics: align_corners=False, NO antialias (the 2022-era
    torchvision the reference pins uses antialias=False for tensors — each
    output pixel is a 2-tap blend even when downscaling). Built with numpy at
    trace time: sizes are static, so this folds to an XLA constant."""
    import numpy as np

    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src)
    w1 = src - i0
    i0c = np.clip(i0, 0, in_size - 1).astype(np.int64)
    i1c = np.clip(i0 + 1, 0, in_size - 1).astype(np.int64)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(m, (np.arange(out_size), i0c), (1.0 - w1).astype(np.float32))
    np.add.at(m, (np.arange(out_size), i1c), w1.astype(np.float32))
    return m


def resize_bilinear(
    images: Array, out_hw: Tuple[int, int], dtype: jnp.dtype = jnp.float32
) -> Array:
    """Bilinear resize on the (..., H, W, C) spatial axes, exactly matching
    torchvision tensor-mode Resize (align_corners=False, antialias off) —
    parity-critical at rollout time vs the reference's eval transforms.

    TPU note: implemented as two constant-matrix MXU matmuls
    (out = R_h @ img @ R_w^T) instead of jax.image.resize — the latter
    antialiases on downscale (different numerics from the reference) and is
    slower than the pure-GEMM form. ``dtype=bfloat16`` halves the HBM
    traffic; for uint8 sources the accumulated bf16 rounding across the
    aug chain is ~3 uint8 levels worst-case (bounded in test_pallas_aug)."""
    *lead, h, w, c = images.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return images.astype(dtype)
    flat = images.reshape((-1, h, w, c)).astype(dtype)
    ry = jnp.asarray(_interp_matrix(h, oh), dtype)
    rx = jnp.asarray(_interp_matrix(w, ow), dtype)
    t = jnp.einsum("yh,nhwc->nywc", ry, flat, preferred_element_type=dtype)
    out = jnp.einsum("xw,nywc->nyxc", rx, t, preferred_element_type=dtype)
    return out.reshape(tuple(lead) + (oh, ow, c))


def random_shift(
    key: Array, images: Array, pad: int, dtype: jnp.dtype = jnp.float32
) -> Array:
    """DrQ random-shift (utils/transforms.py:265-299): replicate-pad by
    ``pad`` then integer-translate by (dy, dx) ~ U{0..2pad} per image, zeros
    never enter (shifts stay in the padded bounds). images: (N, H, W, C).

    TPU note: implemented as one-hot selection MATMULS
    (out = Sy @ x @ Sx^T per image) rather than per-image dynamic
    slices — a vmapped dynamic_slice lowers to gathers that cost ~160 ms for
    a 1024-frame batch on v5e, while the einsum rides the MXU in <1 ms. The
    edge replication is folded INTO the selection matrices by clamping the
    source index (clamp(y + dy - pad, 0, H-1) == edge-pad-then-slice), so
    the (H+2p)² padded intermediate is never materialized in HBM. The
    one-hot products are exact (single nonzero per row), so this is still an
    exact integer translation."""
    n, h, w, c = images.shape
    x = images.astype(dtype)
    shifts = jax.random.randint(key, (n, 2), 0, 2 * pad + 1)
    rows_out = jnp.arange(h)
    cols_out = jnp.arange(w)
    # Sy[n, y, ys] = 1 iff ys == clamp(y + dy[n] - pad, 0, H-1); Sx likewise
    src_y = jnp.clip(
        rows_out[None, :] + shifts[:, 0][:, None] - pad, 0, h - 1
    )
    src_x = jnp.clip(
        cols_out[None, :] + shifts[:, 1][:, None] - pad, 0, w - 1
    )
    sy = (src_y[:, :, None] == rows_out[None, None, :]).astype(dtype)
    sx = (src_x[:, :, None] == cols_out[None, None, :]).astype(dtype)
    out = jnp.einsum("nyh,nhwc->nywc", sy, x, preferred_element_type=dtype)
    out = jnp.einsum("nxw,nywc->nyxc", sx, out, preferred_element_type=dtype)
    return out


def resize_shift(
    key: Array,
    images: Array,
    out_hw: Tuple[int, int],
    pad: int,
    dtype: jnp.dtype = jnp.float32,
) -> Array:
    """Fused resize_bilinear + random_shift: the per-image one-hot shift
    matrices are composed with the CONSTANT interpolation matrices first
    (two tiny (out, out) @ (out, in) matmuls per image), so the image tensor
    itself makes only TWO passes (rows, cols) instead of four — bit-identical
    to resize_bilinear followed by random_shift with the same key (the
    one-hot composition merely copies interp-matrix rows, so every sum over
    source pixels is computed in the same order)."""
    n, h, w, c = images.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    x = images.astype(dtype)
    ry = jnp.asarray(_interp_matrix(h, oh), dtype)  # (oh, h)
    rx = jnp.asarray(_interp_matrix(w, ow), dtype)  # (ow, w)
    shifts = jax.random.randint(key, (n, 2), 0, 2 * pad + 1)
    rows_out = jnp.arange(oh)
    cols_out = jnp.arange(ow)
    src_y = jnp.clip(rows_out[None, :] + shifts[:, 0][:, None] - pad, 0, oh - 1)
    src_x = jnp.clip(cols_out[None, :] + shifts[:, 1][:, None] - pad, 0, ow - 1)
    sy = (src_y[:, :, None] == rows_out[None, None, :]).astype(dtype)
    sx = (src_x[:, :, None] == cols_out[None, None, :]).astype(dtype)
    cy = jnp.einsum("nys,sh->nyh", sy, ry, preferred_element_type=dtype)
    cx = jnp.einsum("nxs,sw->nxw", sx, rx, preferred_element_type=dtype)
    out = jnp.einsum("nyh,nhwc->nywc", cy, x, preferred_element_type=dtype)
    out = jnp.einsum("nxw,nywc->nyxc", cx, out, preferred_element_type=dtype)
    return out


# ---------------------------------------------------------------------------
# HSV color space (torchvision-equivalent)
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: Array) -> Array:
    """(..., 3) float in [0,1] -> HSV in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    safe_delta = jnp.where(deltac > 0, deltac, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(deltac > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: Array) -> Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    # where-chains, NOT jnp.choose: choose lowers to per-pixel gathers which
    # are catastrophically slow on the TPU VPU
    r = jnp.where(
        (i == 0) | (i == 5), v, jnp.where(i == 1, q, jnp.where(i == 4, t, p))
    )
    g = jnp.where(
        (i == 1) | (i == 2), v, jnp.where(i == 0, t, jnp.where(i == 3, q, p))
    )
    b = jnp.where(
        (i == 3) | (i == 4), v, jnp.where(i == 2, t, jnp.where(i == 5, q, p))
    )
    return jnp.stack([r, g, b], axis=-1)


def _grayscale(rgb: Array) -> Array:
    """ITU-R 601 luma used by torchvision rgb_to_grayscale."""
    return (
        0.2989 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    )


def _adjust_brightness(img: Array, factor: Array) -> Array:
    return jnp.clip(img * factor, 0.0, 1.0)


def _adjust_contrast(img: Array, factor: Array) -> Array:
    mean = jnp.mean(_grayscale(img), axis=(-2, -1), keepdims=True)[..., None]
    return jnp.clip(factor * img + (1.0 - factor) * mean, 0.0, 1.0)


def _adjust_hue(img: Array, offset: Array) -> Array:
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + offset[..., 0]) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(
    key: Array,
    images: Array,
    brightness: float = 0.1,
    contrast: float = 0.1,
    hue: float = 0.02,
    prob: float = 1.0,
) -> Array:
    """Per-image torchvision-style ColorJitter over a batch (N, H, W, 3) of
    floats in [0,1]; random per-image op order; applied with ``prob``."""
    n = images.shape[0]
    k_b, k_c, k_h, k_ord, k_p = jax.random.split(key, 5)
    b_f = jax.random.uniform(
        k_b, (n, 1, 1, 1), minval=max(0.0, 1.0 - brightness),
        maxval=1.0 + brightness,
    )
    c_f = jax.random.uniform(
        k_c, (n, 1, 1, 1), minval=max(0.0, 1.0 - contrast),
        maxval=1.0 + contrast,
    )
    h_f = jax.random.uniform(k_h, (n, 1, 1, 1), minval=-hue, maxval=hue)
    order = jnp.argsort(jax.random.uniform(k_ord, (n, 3)), axis=-1)  # (N, 3)

    def apply_op(img4, op_idx, bf, cf, hf):
        return jax.lax.switch(
            op_idx,
            [
                lambda im: _adjust_brightness(im, bf),
                lambda im: _adjust_contrast(im, cf),
                lambda im: _adjust_hue(im, hf),
            ],
            img4,
        )

    def jitter_one(img, ops, bf, cf, hf):
        img = img[None]
        for j in range(3):
            img = apply_op(img, ops[j], bf, cf, hf)
        return img[0]

    jittered = jax.vmap(jitter_one)(images, order, b_f, c_f, h_f)
    if prob >= 1.0:
        return jittered
    keep = jax.random.uniform(k_p, (n, 1, 1, 1)) < prob
    return jnp.where(keep, jittered, images)


def normalize(images: Array, mean: float = 0.5, std: float = 0.5) -> Array:
    return (images - mean) / std


def add_gaussian_noise(key: Array, x: Array, mean=0.0, std=1.0) -> Array:
    """Additive Gaussian noise (utils/transforms.py:184-201)."""
    return x + jax.random.normal(key, x.shape, x.dtype) * std + mean


def add_depth_noise(
    key: Array, depth: Array, shape: float = 1000.0, rate: float = 1000.0
) -> Array:
    """Multiplicative gamma noise, DexNet-style (utils/transforms.py:204-227)
    — one scalar multiplier per call, like the reference."""
    mult = jax.random.gamma(key, shape) / rate
    return depth * mult


def scale_depth(depth: Array, min_depth: float, max_depth: float) -> Array:
    return jnp.clip((depth - min_depth) / (max_depth - min_depth), 0.0, 1.0)


# "jet" colormap LUT construction (matplotlib-equivalent piecewise linear),
# used by ColorizeDepth (utils/transforms.py:161-181) without matplotlib at
# runtime.
def _jet_lut(n: int = 256) -> jnp.ndarray:
    x = jnp.linspace(0.0, 1.0, n)

    def interp(v, points):
        xs = jnp.asarray([p[0] for p in points])
        ys = jnp.asarray([p[1] for p in points])
        return jnp.interp(v, xs, ys)

    r = interp(x, [(0.0, 0.0), (0.35, 0.0), (0.66, 1.0), (0.89, 1.0), (1.0, 0.5)])
    g = interp(x, [(0.0, 0.0), (0.125, 0.0), (0.375, 1.0), (0.64, 1.0), (0.91, 0.0), (1.0, 0.0)])
    b = interp(x, [(0.0, 0.5), (0.11, 1.0), (0.34, 1.0), (0.65, 0.0), (1.0, 0.0)])
    return jnp.stack([r, g, b], axis=-1)


def colorize_depth(depth01: Array) -> Array:
    """(..., H, W) in [0,1] -> (..., H, W, 3) jet-colorized. The LUT is a
    compile-time constant (never cache traced values across jit scopes)."""
    lut = _jet_lut()
    idx = jnp.clip((depth01 * 255.0).astype(jnp.int32), 0, 255)
    return lut[idx]


# ---------------------------------------------------------------------------
# fused pipelines
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "pad", "brightness", "contrast", "hue", "prob"),
)
def augment_rgb_train(
    key: Array,
    images: Array,
    out_hw: Tuple[int, int] = (128, 128),
    pad: int = 6,
    brightness: float = 0.1,
    contrast: float = 0.1,
    hue: float = 0.02,
    prob: float = 1.0,
) -> Array:
    """Full train pipeline for an rgb modality: uint8 (N, H, W, 3) [or
    (N, T, H, W, 3), flattened internally] -> normalized float32 in [-1, 1].
    """
    lead = images.shape[:-3]
    flat = images.reshape((-1,) + images.shape[-3:])
    k_shift, k_jit = jax.random.split(key)
    x = resize_bilinear(flat, out_hw)  # float 0..255
    x = random_shift(k_shift, x, pad)
    x = jnp.clip(x / 255.0, 0.0, 1.0)
    x = color_jitter(k_jit, x, brightness, contrast, hue, prob)
    x = normalize(x)
    return x.reshape(lead + x.shape[1:])


@functools.partial(jax.jit, static_argnames=("out_hw",))
def augment_rgb_eval(images: Array, out_hw: Tuple[int, int] = (128, 128)) -> Array:
    """Validation pipeline: resize -> scale -> normalize."""
    lead = images.shape[:-3]
    flat = images.reshape((-1,) + images.shape[-3:])
    x = resize_bilinear(flat, out_hw)
    x = jnp.clip(x / 255.0, 0.0, 1.0)
    x = normalize(x)
    return x.reshape(lead + x.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("out_hw", "pad", "min_depth", "max_depth")
)
def augment_depth_train(
    key: Array,
    depth: Array,
    out_hw: Tuple[int, int] = (128, 128),
    pad: int = 6,
    min_depth: float = 0.0,
    max_depth: float = 2.0,
) -> Array:
    """Depth pipeline: resize -> random shift -> scale -> jet colorize ->
    normalize; (N[, T], H, W) -> (..., H', W', 3)."""
    lead = depth.shape[:-2]
    flat = depth.reshape((-1,) + depth.shape[-2:] + (1,))
    x = resize_bilinear(flat, out_hw)
    x = random_shift(key, x, pad)
    x = scale_depth(x[..., 0], min_depth, max_depth)
    x = colorize_depth(x)
    x = normalize(x)
    return x.reshape(lead + x.shape[1:])


@functools.partial(jax.jit, static_argnames=("out_hw", "min_depth", "max_depth"))
def augment_depth_eval(
    depth: Array,
    out_hw: Tuple[int, int] = (128, 128),
    min_depth: float = 0.0,
    max_depth: float = 2.0,
) -> Array:
    lead = depth.shape[:-2]
    flat = depth.reshape((-1,) + depth.shape[-2:] + (1,))
    x = resize_bilinear(flat, out_hw)
    x = scale_depth(x[..., 0], min_depth, max_depth)
    x = colorize_depth(x)
    x = normalize(x)
    return x.reshape(lead + x.shape[1:])
