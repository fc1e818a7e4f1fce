"""Device-side per-modality transform manager.

The TPU replacement for the reference TransformManager's per-phase Compose
pipelines (utils/transforms.py:14-84 + rl_train.yaml): a config of the form

    rgb_static:  {kind: rgb,    size: [128,128], pad: 6, brightness: 0.1,
                  contrast: 0.1, hue: 0.02, jitter_prob: 1.0}
    depth_static:{kind: depth,  size: [128,128], pad: 6,
                  min_depth: 3.5, max_depth: 6.3}
    robot_obs:   {kind: vector, mean: [...], std: [...]}

maps every observation modality to a fused, key-driven, jit-safe function.
Train applies the full augmentation; validation applies the deterministic
subset (resize/scale/normalize) — mirroring the reference's
train/validation transform split.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.ops import image_aug
from tacorl_tpu.utils import stable_fold as _stable_fold

__all__ = ["DeviceTransforms"]


class DeviceTransforms:
    def __init__(self, transforms: Optional[Dict[str, dict]] = None):
        self.cfg = {k: dict(v) for k, v in (transforms or {}).items()}

    def _apply_one(
        self, key: Array, modality: str, value: Array, train: bool
    ) -> Array:
        cfg = self.cfg.get(modality)
        if cfg is None:
            return value.astype(jnp.float32) if value.dtype != jnp.float32 else value
        kind = cfg.get("kind", "rgb" if "rgb" in modality else
                       "depth" if "depth" in modality else "vector")
        if kind == "rgb":
            size = tuple(cfg.get("size", (128, 128)))
            if train:
                # Pallas jitter tail by default on TPU (4x over the XLA
                # elementwise chain, measured scanned/fetch-forced on v5e);
                # CPU/interpret platforms take the pure-XLA path
                use_pallas = cfg.get(
                    "use_pallas", jax.default_backend() == "tpu"
                )
                if use_pallas:
                    return self._pallas_rgb_train(key, value, cfg, size)
                return image_aug.augment_rgb_train(
                    key,
                    value,
                    out_hw=size,
                    pad=int(cfg.get("pad", 6)),
                    brightness=float(cfg.get("brightness", 0.1)),
                    contrast=float(cfg.get("contrast", 0.1)),
                    hue=float(cfg.get("hue", 0.02)),
                    prob=float(cfg.get("jitter_prob", 1.0)),
                )
            return image_aug.augment_rgb_eval(value, out_hw=size)
        if kind == "depth":
            size = tuple(cfg.get("size", (128, 128)))
            lo = float(cfg.get("min_depth", 0.0))
            hi = float(cfg.get("max_depth", 2.0))
            if train:
                x = value
                if cfg.get("gamma_noise", False):
                    # DexNet multiplicative depth noise (transforms.py:204-227)
                    x = image_aug.add_depth_noise(
                        jax.random.fold_in(key, 3),
                        x.astype(jnp.float32),
                        shape=float(cfg.get("gamma_shape", 1000.0)),
                        rate=float(cfg.get("gamma_rate", 1000.0)),
                    )
                return image_aug.augment_depth_train(
                    key, x, out_hw=size, pad=int(cfg.get("pad", 6)),
                    min_depth=lo, max_depth=hi,
                )
            return image_aug.augment_depth_eval(
                value, out_hw=size, min_depth=lo, max_depth=hi
            )
        if kind == "vector":
            x = value.astype(jnp.float32)
            mean = jnp.asarray(cfg.get("mean", 0.0), dtype=jnp.float32)
            std = jnp.asarray(cfg.get("std", 1.0), dtype=jnp.float32)
            std = jnp.where(std == 0.0, 1.0, std)
            x = (x - mean) / std
            if train and float(cfg.get("noise_std", 0.0)) > 0.0:
                x = image_aug.add_gaussian_noise(
                    jax.random.fold_in(key, 5), x,
                    std=float(cfg.get("noise_std", 0.0)),
                )
            return x
        raise ValueError(f"unknown transform kind {kind!r}")

    def _pallas_rgb_train(self, key, value, cfg, size):
        """Fused XLA resize+shift (ops/image_aug.py:resize_shift — the shift
        one-hots composed with the constant interp matrices, two passes over
        the image data total), then the fused Pallas jitter/normalize tail
        (ops/pallas_aug.py, verified to compile+run on v5e) — enable with
        ``use_pallas: true`` per modality (default on TPU).

        The fully-fused v2 kernel (pallas_augment_rgb_train) now LOWERS on
        this toolchain (r2: the un-lowerable dynamic rotate was replaced by
        one-hot matmul shifts, max err 1e-6 vs interpret) but measured
        SLOWER end-to-end (51.8 vs 67.9 steps/s on the Play-LMP bench): the
        per-image 140-wide selection matmuls tile poorly on the MXU, while
        XLA's batched shift is one big GEMM. Kept available for wider pads /
        future Mosaic versions; see BASELINE.md."""
        from tacorl_tpu.ops.pallas_aug import pallas_augment_tail

        # aug_dtype: bfloat16 halves the HBM traffic of the whole resize ->
        # shift -> jitter chain (~3 uint8 levels of accumulated rounding,
        # bounded in test_pallas_aug); f32 default keeps bit-parity with the
        # XLA reference path for tests.
        aug_dtype = str(cfg.get("aug_dtype", "float32"))
        if aug_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"aug_dtype must be float32|bfloat16, got {aug_dtype!r}"
            )
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[aug_dtype]
        k_shift, k_jit = jax.random.split(key)
        lead = value.shape[:-3]
        flat = value.reshape((-1,) + value.shape[-3:])
        x = image_aug.resize_shift(
            k_shift, flat, tuple(size), int(cfg.get("pad", 6)), dtype=dtype
        )
        out = pallas_augment_tail(
            k_jit,
            x,
            brightness=float(cfg.get("brightness", 0.1)),
            contrast=float(cfg.get("contrast", 0.1)),
            hue=float(cfg.get("hue", 0.02)),
            prob=float(cfg.get("jitter_prob", 1.0)),
        )
        return out.reshape(lead + out.shape[1:])

    def __call__(
        self, key: Array, states: Dict[str, Any], train: bool = True
    ) -> Dict[str, Any]:
        """Transform a (possibly nested) dict of modality arrays. Each leaf
        gets an independent fold of ``key``."""

        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            if not path:  # flat-array observation (state-based envs)
                return jnp.asarray(node, dtype=jnp.float32)
            leaf_key = key
            for p in path:
                # Stable digest fold: Python's str hash is per-process
                # salted (PYTHONHASHSEED), which would make augmentation
                # streams differ across restarts/hosts.
                leaf_key = jax.random.fold_in(leaf_key, _stable_fold(p))
            return self._apply_one(leaf_key, path[-1], node, train)

        return walk(states, ())
