"""Pallas TPU kernel: fused color-jitter + normalize.

One VMEM-resident pass per image fuses the whole post-shift augmentation tail
(scale -> brightness/contrast/hue in a random per-image order -> normalize):
the image is read from HBM once and written once, with the contrast-mean
reduction computed in VMEM — no intermediate HBM round-trips between the
pipeline stages (utils/transforms.py runs these as separate CPU ops).

Grid: one program per image. Blocks: the full (H, W, 3) image in VMEM
(128x128x3 f32 = 192 KiB, well under the ~16 MB VMEM budget), per-image
factors in SMEM. The random factors and the op order are sampled OUTSIDE the
kernel with the standard JAX PRNG (they are tiny), keeping the kernel purely
deterministic data flow.

Numerics match tacorl_tpu.ops.image_aug.color_jitter + normalize exactly
(verified in tests/test_pallas_aug.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_jitter_normalize", "pallas_augment_tail"]


def _grayscale(x: Array) -> Array:
    """x: (3, H, W) planar."""
    return 0.2989 * x[0] + 0.587 * x[1] + 0.114 * x[2]


def _adjust_brightness(x: Array, f: Array) -> Array:
    return jnp.clip(x * f, 0.0, 1.0)


def _adjust_contrast(x: Array, f: Array) -> Array:
    mean = jnp.mean(_grayscale(x))
    return jnp.clip(f * x + (1.0 - f) * mean, 0.0, 1.0)


def _rgb_to_hsv_kernel(x: Array) -> Tuple[Array, Array, Array]:
    r, g, b = x[0], x[1], x[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, h, 0.0)
    return (h / 6.0) % 1.0, s, maxc


def _hsv_to_rgb_kernel(h: Array, s: Array, v: Array) -> Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.where(
        (i == 0) | (i == 5), v,
        jnp.where(i == 1, q, jnp.where(i == 4, t, p)),
    )
    g = jnp.where(
        (i == 1) | (i == 2), v,
        jnp.where(i == 0, t, jnp.where(i == 3, q, p)),
    )
    b = jnp.where(
        (i == 3) | (i == 4), v,
        jnp.where(i == 2, t, jnp.where(i == 5, q, p)),
    )
    return jnp.stack([r, g, b], axis=0)


def _adjust_hue(x: Array, offset: Array) -> Array:
    h, s, v = _rgb_to_hsv_kernel(x)
    return _hsv_to_rgb_kernel((h + offset) % 1.0, s, v)


PERMS = ["bch", "bhc", "cbh", "chb", "hbc", "hcb"]


def _jitter_kernel(img_ref, factors_ref, out_ref):
    """factors row: [brightness, contrast, hue, op0, op1, op2, apply, pad]
    in SMEM; op slots select brightness(0)/contrast(1)/hue(2). A predicated
    where-chain per slot keeps the VMEM footprint at a few image buffers
    (a 6-way lax.switch made Mosaic sum all branches' scratch and blow the
    16 MB scoped-vmem limit). IO may be bf16 (HBM-traffic halving); all
    in-kernel math is f32 in VMEM."""
    x = img_ref[0].astype(jnp.float32) * (1.0 / 255.0)  # (3, H, W) planar
    x = jnp.clip(x, 0.0, 1.0)
    bf = factors_ref[0, 0, 0]
    cf = factors_ref[0, 0, 1]
    hf = factors_ref[0, 0, 2]
    apply = factors_ref[0, 0, 6] > 0.5

    y = x
    for slot in range(3):
        op = factors_ref[0, 0, 3 + slot].astype(jnp.int32)
        y = jnp.where(
            op == 0,
            _adjust_brightness(y, bf),
            jnp.where(op == 1, _adjust_contrast(y, cf), _adjust_hue(y, hf)),
        )
    result = jnp.where(apply, y, x)
    out_ref[0] = ((result - 0.5) / 0.5).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_jitter_normalize(
    images: Array, factors: Array, interpret: bool = False
) -> Array:
    """images: (N, 3, H, W) PLANAR float32/bfloat16 in 0..255 (post
    resize/shift); factors: (N, 8) float32 [brightness, contrast, hue, op0,
    op1, op2, apply, pad]. Returns normalized planar images in [-1, 1] in
    the INPUT dtype (kernel math is always f32 in VMEM)."""
    n, c, h, w = images.shape
    assert c == 3, "planar (N, 3, H, W) expected"
    dtype = images.dtype if images.dtype == jnp.bfloat16 else jnp.float32
    # Per-image factor row blocked into SMEM: a full (N, 8) SMEM table
    # overflows the 1 MB smem budget at N >= ~2048 images/step (batch 128 x
    # window 16 — found by the batch-scaling bench). Mosaic requires the
    # last two block dims to equal the array dims (or 8/128-divisible), so
    # the 8 factors ride a lane-padded (N, 1, 128) layout with a
    # (1, 1, 128) block per grid step.
    factors_padded = jnp.zeros((n, 1, 128), dtype=jnp.float32)
    factors_padded = factors_padded.at[:, 0, :8].set(
        factors.astype(jnp.float32)
    )
    return pl.pallas_call(
        _jitter_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, c, h, w), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(images.shape, dtype),
        interpret=interpret,
    )(images.astype(dtype), factors_padded)


def sample_jitter_factors(
    key: Array,
    n: int,
    brightness: float = 0.1,
    contrast: float = 0.1,
    hue: float = 0.02,
    prob: float = 1.0,
) -> Array:
    """Per-image jitter parameters, sampled with the standard JAX PRNG
    (matching ops.image_aug.color_jitter's sampling semantics but encoding
    the op order as a permutation code)."""
    k_b, k_c, k_h, k_ord, k_p = jax.random.split(key, 5)
    bf = jax.random.uniform(
        k_b, (n,), minval=max(0.0, 1.0 - brightness), maxval=1.0 + brightness
    )
    cf = jax.random.uniform(
        k_c, (n,), minval=max(0.0, 1.0 - contrast), maxval=1.0 + contrast
    )
    hf = jax.random.uniform(k_h, (n,), minval=-hue, maxval=hue)
    code = jax.random.randint(k_ord, (n,), 0, 6)
    # permutation code -> per-slot op ids (0=brightness, 1=contrast, 2=hue)
    table = jnp.asarray(
        [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
        dtype=jnp.float32,
    )
    ops = table[code]
    apply = (jax.random.uniform(k_p, (n,)) < prob).astype(jnp.float32)
    return jnp.concatenate(
        [
            jnp.stack([bf, cf, hf], axis=-1),
            ops,
            apply[:, None],
            jnp.zeros((n, 1), jnp.float32),
        ],
        axis=-1,
    )


def _shift_jitter_kernel(
    img_ref, factors_ref, out_ref, *, out_h, out_w, interpret=False
):
    """v2: consumes the edge-padded planar image and additionally applies the
    DrQ integer shift in VMEM (factors columns 7, 8 hold dy, dx). Mosaic
    requires sublane-aligned dynamic-slice starts (and its dynamic ROTATE
    does not lower through this toolchain — probed r2), so the shift is two
    one-hot selection MATMULS per channel: out = P_dy @ x @ P_dx^T with the
    selection matrices built from iota comparisons. ~15 MFLOP/image of pure
    MXU work, no relayouts; one HBM read, one write for the whole aug tail."""
    i = pl.program_id(0)
    dy = factors_ref[i, 7].astype(jnp.int32)
    dx = factors_ref[i, 8].astype(jnp.int32)
    x = img_ref[0]  # (3, Hp, Wp)
    hp, wp = x.shape[1], x.shape[2]
    # sel_r[r, p] = 1 iff p == r + dy  -> (out_h, Hp) selects shifted rows
    rows_out = jax.lax.broadcasted_iota(jnp.int32, (out_h, hp), 0)
    rows_in = jax.lax.broadcasted_iota(jnp.int32, (out_h, hp), 1)
    sel_r = (rows_in == rows_out + dy).astype(jnp.float32)
    cols_out = jax.lax.broadcasted_iota(jnp.int32, (wp, out_w), 1)
    cols_in = jax.lax.broadcasted_iota(jnp.int32, (wp, out_w), 0)
    sel_c = (cols_in == cols_out + dx).astype(jnp.float32)
    x = jnp.stack(
        [
            jnp.dot(
                jnp.dot(sel_r, x[c], preferred_element_type=jnp.float32),
                sel_c,
                preferred_element_type=jnp.float32,
            )
            for c in range(3)
        ],
        axis=0,
    )
    x = jnp.clip(x * (1.0 / 255.0), 0.0, 1.0)
    bf = factors_ref[i, 0]
    cf = factors_ref[i, 1]
    hf = factors_ref[i, 2]
    apply = factors_ref[i, 6] > 0.5
    y = x
    for slot in range(3):
        op = factors_ref[i, 3 + slot].astype(jnp.int32)
        y = jnp.where(
            op == 0,
            _adjust_brightness(y, bf),
            jnp.where(op == 1, _adjust_contrast(y, cf), _adjust_hue(y, hf)),
        )
    result = jnp.where(apply, y, x)
    out_ref[0] = (result - 0.5) / 0.5


@functools.partial(jax.jit, static_argnames=("pad", "interpret"))
def fused_shift_jitter_normalize(
    padded: Array, factors: Array, pad: int, interpret: bool = False
) -> Array:
    """padded: (N, 3, H+2p, W+2p) planar float32 0..255 (edge-padded);
    factors: (N, 10). Returns (N, 3, H, W) normalized."""
    n, c, hp, wp = padded.shape
    h, w = hp - 2 * pad, wp - 2 * pad
    kernel = functools.partial(
        _shift_jitter_kernel, out_h=h, out_w=w, interpret=interpret
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, c, hp, wp), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        interpret=interpret,
    )(padded.astype(jnp.float32), factors)


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "pad", "brightness", "contrast", "hue", "prob",
                     "interpret"),
)
def pallas_augment_rgb_train(
    key: Array,
    images: Array,
    out_hw: Tuple[int, int] = (128, 128),
    pad: int = 6,
    brightness: float = 0.1,
    contrast: float = 0.1,
    hue: float = 0.02,
    prob: float = 1.0,
    interpret: bool = False,
) -> Array:
    """Full fused train pipeline: resize (XLA, planar) -> edge pad -> Pallas
    shift+scale+jitter+normalize. Drop-in replacement for
    image_aug.augment_rgb_train; input uint8 (..., H, W, 3), output float32
    NHWC in [-1, 1]."""
    lead = images.shape[:-3]
    flat = images.reshape((-1,) + images.shape[-3:])
    n = flat.shape[0]
    planar = jnp.transpose(flat, (0, 3, 1, 2)).astype(jnp.float32)
    if planar.shape[-2:] != tuple(out_hw):
        planar = jax.image.resize(
            planar, (n, 3) + tuple(out_hw), "bilinear"
        )
    padded = jnp.pad(
        planar, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge"
    )
    k_shift, k_jit = jax.random.split(key)
    factors = sample_jitter_factors(k_jit, n, brightness, contrast, hue, prob)
    shifts = jax.random.randint(k_shift, (n, 2), 0, 2 * pad + 1).astype(
        jnp.float32
    )
    factors = jnp.concatenate(
        [factors[:, :7], shifts, jnp.zeros((n, 1), jnp.float32)], axis=-1
    )
    out = fused_shift_jitter_normalize(padded, factors, pad, interpret=interpret)
    out = jnp.transpose(out, (0, 2, 3, 1))
    return out.reshape(lead + out.shape[1:])


def pallas_augment_tail(
    key: Array,
    images: Array,
    brightness: float = 0.1,
    contrast: float = 0.1,
    hue: float = 0.02,
    prob: float = 1.0,
    interpret: bool = False,
) -> Array:
    """Drop-in fused replacement for scale+jitter+normalize on (N, H, W, 3)
    float images in 0..255 (transposes to the kernel's planar layout)."""
    factors = sample_jitter_factors(
        key, images.shape[0], brightness, contrast, hue, prob
    )
    planar = jnp.transpose(images, (0, 3, 1, 2))
    out = fused_jitter_normalize(planar, factors, interpret=interpret)
    return jnp.transpose(out, (0, 2, 3, 1))
