import colorsys

import jax
import jax.numpy as jnp
import numpy as np

from tacorl_tpu.ops.image_aug import (
    augment_depth_eval,
    augment_depth_train,
    augment_rgb_eval,
    augment_rgb_train,
    color_jitter,
    colorize_depth,
    hsv_to_rgb,
    normalize,
    random_shift,
    resize_bilinear,
    rgb_to_hsv,
)


def test_resize_identity_and_downscale(rng):
    img = jax.random.uniform(rng, (2, 8, 8, 3)) * 255
    same = resize_bilinear(img, (8, 8))
    np.testing.assert_allclose(np.asarray(same), np.asarray(img), rtol=1e-6)
    down = resize_bilinear(img, (4, 4))
    assert down.shape == (2, 4, 4, 3)


def test_random_shift_is_integer_translation(rng):
    # image with unique values; zero shift must reproduce, any shift must be
    # a pure translation of the edge-padded image
    h = w = 6
    pad = 2
    img = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    out = random_shift(rng, img, pad)
    padded = np.pad(np.asarray(img[0, :, :, 0]), pad, mode="edge")
    # find which translation it used
    found = False
    for dy in range(2 * pad + 1):
        for dx in range(2 * pad + 1):
            if np.array_equal(
                padded[dy : dy + h, dx : dx + w], np.asarray(out[0, :, :, 0])
            ):
                found = True
    assert found, "output is not an integer translation of the padded image"


def test_random_shift_distribution(rng):
    # all shifts in range, roughly uniform
    img = jnp.zeros((512, 5, 5, 1)).at[:, 2, 2, 0].set(1.0)
    out = random_shift(rng, img, 1)
    # the center pixel must land on all 9 translated positions
    pos = np.asarray(out[:, :, :, 0].reshape(512, -1).argmax(axis=1))
    assert len(np.unique(pos)) == 9


def test_hsv_round_trip_matches_colorsys(rng):
    rgb = np.asarray(jax.random.uniform(rng, (50, 3)))
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    expected = np.asarray([colorsys.rgb_to_hsv(*p) for p in rgb])
    np.testing.assert_allclose(hsv, expected, atol=1e-5)
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_color_jitter_brightness_only(rng):
    img = jnp.full((4, 8, 8, 3), 0.5)
    out = color_jitter(rng, img, brightness=0.5, contrast=0.0, hue=0.0)
    # contrast factor 1 and hue 0 are identities; brightness scales per image
    factors = np.asarray(out[:, 0, 0, 0]) / 0.5
    assert np.all(factors >= 0.5 - 1e-6) and np.all(factors <= 1.5 + 1e-6)
    assert np.std(factors) > 0.0  # per-image
    # each image uniform scaled
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(img[i]) * factors[i], atol=1e-6
        )


def test_color_jitter_prob_zero_identity(rng):
    img = jax.random.uniform(rng, (3, 6, 6, 3))
    out = color_jitter(rng, img, 0.3, 0.3, 0.1, prob=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_augment_rgb_train_shapes_and_range(rng):
    imgs = (jax.random.uniform(rng, (2, 3, 200, 200, 3)) * 255).astype(jnp.uint8)
    out = augment_rgb_train(rng, imgs, out_hw=(128, 128), pad=6)
    assert out.shape == (2, 3, 128, 128, 3)
    assert out.dtype == jnp.float32
    arr = np.asarray(out)
    assert arr.min() >= -1.0 - 1e-5 and arr.max() <= 1.0 + 1e-5


def test_augment_rgb_eval_deterministic(rng):
    imgs = (jax.random.uniform(rng, (2, 84, 84, 3)) * 255).astype(jnp.uint8)
    a = augment_rgb_eval(imgs, out_hw=(84, 84))
    b = augment_rgb_eval(imgs, out_hw=(84, 84))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # pure rescale: (x/255 - .5)/.5
    expected = (np.asarray(imgs, dtype=np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(a), expected, atol=1e-6)


def test_colorize_depth_jet_endpoints():
    lut_lo = np.asarray(colorize_depth(jnp.asarray([[0.0]])))[0, 0]
    lut_hi = np.asarray(colorize_depth(jnp.asarray([[1.0]])))[0, 0]
    # jet: low end dark blue, high end dark red
    assert lut_lo[2] > 0.4 and lut_lo[0] < 0.1
    assert lut_hi[0] > 0.4 and lut_hi[2] < 0.1


def test_augment_depth_train(rng):
    depth = jax.random.uniform(rng, (2, 2, 100, 100)) * 2.0
    out = augment_depth_train(rng, depth, out_hw=(84, 84), pad=4)
    assert out.shape == (2, 2, 84, 84, 3)
    out_eval = augment_depth_eval(depth, out_hw=(84, 84))
    assert out_eval.shape == (2, 2, 84, 84, 3)


def test_resize_matches_torchvision_tensor_semantics(rng):
    """resize_bilinear must match torch F.interpolate(align_corners=False,
    antialias=False) — the reference's torchvision tensor-mode Resize
    (config/datamodule/transform_manager/transforms/rl_train.yaml:3-4) —
    including on downscale, where jax.image.resize would antialias."""
    import torch
    import torch.nn.functional as F

    img = np.asarray(jax.random.uniform(rng, (2, 50, 40, 3)) * 255, np.float32)
    for out_hw in ((32, 32), (25, 20), (84, 84)):
        ours = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))
        theirs = (
            F.interpolate(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                size=out_hw, mode="bilinear", align_corners=False,
                antialias=False,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


def test_resize_shift_fused_is_bit_identical(rng):
    """resize_shift (shift one-hots composed with the constant interp
    matrices) must equal resize_bilinear -> random_shift exactly: the
    composition only copies interp rows, so every source-pixel sum is
    computed in the same order."""
    from tacorl_tpu.ops.image_aug import resize_shift

    img = (jax.random.uniform(rng, (3, 50, 40, 3)) * 255).astype(jnp.uint8)
    k = jax.random.fold_in(rng, 1)
    two_stage = random_shift(k, resize_bilinear(img, (32, 32)), 4)
    fused = resize_shift(k, img, (32, 32), 4)
    np.testing.assert_array_equal(np.asarray(two_stage), np.asarray(fused))
