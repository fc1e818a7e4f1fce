"""Pallas fused-augmentation kernel vs the XLA reference implementation
(interpret mode — the Mosaic compile path runs on real TPUs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.ops.image_aug import (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_hue,
    normalize,
)
from tacorl_tpu.ops.pallas_aug import fused_jitter_normalize


def reference_tail(images, factors):
    """XLA reference of the kernel semantics."""
    x = jnp.clip(images.astype(jnp.float32) / 255.0, 0.0, 1.0)
    out = []
    for i in range(images.shape[0]):
        y = x[i : i + 1]
        bf = factors[i, 0].reshape(1, 1, 1, 1)
        cf = factors[i, 1].reshape(1, 1, 1, 1)
        hf = factors[i, 2].reshape(1, 1, 1, 1)
        for slot in range(3):
            op = int(factors[i, 3 + slot])
            if op == 0:
                y = _adjust_brightness(y, bf)
            elif op == 1:
                y = _adjust_contrast(y, cf)
            else:
                y = _adjust_hue(y, hf)
        y = jnp.where(factors[i, 6] > 0.5, y, x[i : i + 1])
        out.append(y[0])
    return normalize(jnp.stack(out))


@pytest.mark.parametrize("apply", [1.0, 0.0])
def test_fused_kernel_matches_reference(rng, apply):
    n, h, w = 4, 16, 16
    images = jax.random.uniform(rng, (n, h, w, 3)) * 255.0
    rs = np.random.RandomState(0)
    perm_table = np.asarray(
        [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]]
    )
    ops = perm_table[rs.randint(0, 6, n)]
    factors = np.concatenate(
        [
            np.stack(
                [
                    rs.uniform(0.9, 1.1, n),
                    rs.uniform(0.9, 1.1, n),
                    rs.uniform(-0.02, 0.02, n),
                ],
                axis=-1,
            ),
            ops.astype(np.float64),
            np.full((n, 1), apply),
            np.zeros((n, 1)),
        ],
        axis=-1,
    ).astype(np.float32)
    planar = jnp.transpose(images, (0, 3, 1, 2))
    out = fused_jitter_normalize(planar, jnp.asarray(factors), interpret=True)
    out = jnp.transpose(out, (0, 2, 3, 1))
    expected = reference_tail(images, factors)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)
    assert np.asarray(out).min() >= -1.0 - 1e-5
    assert np.asarray(out).max() <= 1.0 + 1e-5


def test_fused_shift_kernel_matches_reference(rng):
    """v2 kernel (shift + jitter + normalize) vs the XLA ops composed."""
    from tacorl_tpu.ops.image_aug import random_shift
    from tacorl_tpu.ops.pallas_aug import fused_shift_jitter_normalize

    n, h, w, pad = 3, 12, 12, 2
    images = jax.random.uniform(rng, (n, h, w, 3)) * 255.0
    rs = np.random.RandomState(1)
    perm_table = np.asarray(
        [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]]
    )
    ops = perm_table[rs.randint(0, 6, n)]
    shifts = rs.randint(0, 2 * pad + 1, (n, 2))
    factors = np.concatenate(
        [
            np.stack(
                [rs.uniform(0.9, 1.1, n), rs.uniform(0.9, 1.1, n),
                 rs.uniform(-0.02, 0.02, n)], axis=-1,
            ),
            ops.astype(np.float64),
            np.ones((n, 1)),
            shifts.astype(np.float64),
            np.zeros((n, 1)),
        ],
        axis=-1,
    ).astype(np.float32)

    planar = jnp.transpose(images, (0, 3, 1, 2))
    padded = jnp.pad(planar, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    out = fused_shift_jitter_normalize(
        padded, jnp.asarray(factors), pad, interpret=True
    )
    out = jnp.transpose(out, (0, 2, 3, 1))

    # reference: manual shift then the jitter reference
    shifted = []
    pd = np.pad(np.asarray(images), ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode="edge")
    for i in range(n):
        dy, dx = shifts[i]
        shifted.append(pd[i, dy : dy + h, dx : dx + w])
    expected = reference_tail(jnp.asarray(np.stack(shifted)), factors)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_pallas_augment_rgb_train_end_to_end(rng):
    from tacorl_tpu.ops.pallas_aug import pallas_augment_rgb_train

    imgs = (jax.random.uniform(rng, (2, 3, 40, 40, 3)) * 255).astype(jnp.uint8)
    out = pallas_augment_rgb_train(
        rng, imgs, out_hw=(32, 32), pad=2, interpret=True
    )
    assert out.shape == (2, 3, 32, 32, 3)
    arr = np.asarray(out)
    assert arr.min() >= -1.0 - 1e-5 and arr.max() <= 1.0 + 1e-5


def test_bf16_aug_chain_tracks_f32(rng):
    """aug_dtype=bfloat16 (production TPU setting) must track the f32 chain
    to uint8-quantization-level error across resize + shift + fused tail."""
    from tacorl_tpu.ops.image_aug import random_shift, resize_bilinear
    from tacorl_tpu.ops.pallas_aug import (
        fused_jitter_normalize,
        sample_jitter_factors,
    )

    imgs = jax.random.randint(rng, (4, 40, 40, 3), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    k_shift, k_jit = jax.random.split(rng)

    def chain(dtype):
        x = resize_bilinear(imgs, (32, 32), dtype=dtype)
        x = random_shift(k_shift, x, 2, dtype=dtype)
        factors = sample_jitter_factors(k_jit, 4)
        planar = jnp.transpose(x, (0, 3, 1, 2))
        out = fused_jitter_normalize(planar, factors, interpret=True)
        return jnp.transpose(out, (0, 2, 3, 1))

    out32 = chain(jnp.float32)
    out16 = chain(jnp.bfloat16)
    assert out16.dtype == jnp.bfloat16
    # output range is [-1, 1]; atol 0.025 ~ 3 uint8 levels (bf16 eps
    # ~8e-3 compounds over the 3-stage chain; not one quantization level)
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(out16, dtype=np.float32), atol=0.025
    )
