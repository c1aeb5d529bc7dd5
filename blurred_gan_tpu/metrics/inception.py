"""InceptionV3 feature trunk (pool3, 2048-d) in pure JAX — the real-FID path.

The reference computes FID on the TF-Hub InceptionV3 feature vector
(/root/reference/metrics.py:169-170: ``inception_v3/feature_vector``, 2048-d
pool3 activations of 299×299 inputs). This container has no network egress, so
the *weights* cannot be fetched — but the *architecture* can and should exist
locally: this module implements the full InceptionV3 trunk as a functional JAX
program (no framework model object; a flat ``{scope: {w, beta, mean, var}}``
parameter dict threaded through one jitted apply), plus a loader for locally
provided weights.

Weights
-------
``load_inception_weights(path)`` reads an ``.npz`` whose keys follow this
module's canonical scopes (torchvision-style block/branch names, see
``conv_specs()``), four arrays per conv unit::

    <scope>/w      (kh, kw, cin, cout)  HWIO conv kernel
    <scope>/beta   (cout,)              BN shift   (slim BatchNorm has no scale)
    <scope>/mean   (cout,)              BN moving mean
    <scope>/var    (cout,)              BN moving variance

e.g. ``Conv2d_1a_3x3/w`` or ``Mixed_6b/branch7x7_2/beta``. Converting a public
checkpoint offline: torchvision's ``inception_v3`` modules map 1:1 onto these
scopes (transpose OIHW→HWIO) — but note torchvision's BatchNorm2d carries a
learned scale γ this layout has no slot for (TF-slim's inception BN is
``scale=False``, which is what this trunk implements). Fold it in first — BN
is ``γ·(conv(x)−μ)/σ + β`` and conv is linear per output channel, so storing
``w[..., c] *= γ_c`` and ``mean_c *= γ_c`` (``var``/``beta`` unchanged)
reproduces the γ-scaled network exactly. TF-slim checkpoints
(``InceptionV3/<scope>/weights`` + ``BatchNorm/{beta,moving_mean,
moving_variance}``) need no folding (no γ); mind slim's Mixed_5c
``Conv2d_0b_1x1`` / ``Conv_1_0c_5x5`` naming quirk in Branch_1. Without a weights file,
``random_inception_params`` gives a fixed-seed random-weight trunk — the
architecture is then still exercised end-to-end (and random-feature FID is a
deterministic, documented fallback), but numbers are NOT comparable to
published FIDs; callers are told loudly.

Inputs are NHWC in **[-1, 1]** (the GAN's native range; also slim's inception
preprocessing range). ``inception_feature_fn`` resizes to 299² bilinearly and
tiles grayscale to RGB — the reference demos' preprocessing
(demo_mnist.py:174-183). The trunk is fully convolutional, so any input
≥ 75×75 is also valid when resizing is disabled (used by fast tests).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Architecture spec
# ---------------------------------------------------------------------------

# Inception blocks at 35×35 (Mixed_5b/5c/5d): (branch-pool 1×1 width varies)
_MIXED_35 = [("Mixed_5b", 32), ("Mixed_5c", 64), ("Mixed_5d", 64)]
# 17×17 blocks (Mixed_6b..6e): the 7×7-factorised branch width c7 varies.
_MIXED_17 = [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
             ("Mixed_6e", 192)]
_MIXED_8 = ["Mixed_7b", "Mixed_7c"]

FEATURE_DIM = 2048
MIN_INPUT_HW = 75  # smallest spatial size the valid-padded stem accepts


def conv_specs() -> List[Tuple[str, Tuple[int, int], int, int]]:
    """Every conv unit as (scope, (kh, kw), cin, cout), in forward order.

    This single list drives parameter init, weight loading/validation and is
    the canonical name registry for converters.
    """
    specs: List[Tuple[str, Tuple[int, int], int, int]] = [
        ("Conv2d_1a_3x3", (3, 3), 3, 32),
        ("Conv2d_2a_3x3", (3, 3), 32, 32),
        ("Conv2d_2b_3x3", (3, 3), 32, 64),
        ("Conv2d_3b_1x1", (1, 1), 64, 80),
        ("Conv2d_4a_3x3", (3, 3), 80, 192),
    ]
    cin = 192
    for name, pool_w in _MIXED_35:
        specs += [
            (f"{name}/branch1x1", (1, 1), cin, 64),
            (f"{name}/branch5x5_1", (1, 1), cin, 48),
            (f"{name}/branch5x5_2", (5, 5), 48, 64),
            (f"{name}/branch3x3dbl_1", (1, 1), cin, 64),
            (f"{name}/branch3x3dbl_2", (3, 3), 64, 96),
            (f"{name}/branch3x3dbl_3", (3, 3), 96, 96),
            (f"{name}/branch_pool", (1, 1), cin, pool_w),
        ]
        cin = 64 + 64 + 96 + pool_w
    specs += [
        ("Mixed_6a/branch3x3", (3, 3), cin, 384),
        ("Mixed_6a/branch3x3dbl_1", (1, 1), cin, 64),
        ("Mixed_6a/branch3x3dbl_2", (3, 3), 64, 96),
        ("Mixed_6a/branch3x3dbl_3", (3, 3), 96, 96),
    ]
    cin = 384 + 96 + cin  # + passthrough max-pool branch
    for name, c7 in _MIXED_17:
        specs += [
            (f"{name}/branch1x1", (1, 1), cin, 192),
            (f"{name}/branch7x7_1", (1, 1), cin, c7),
            (f"{name}/branch7x7_2", (1, 7), c7, c7),
            (f"{name}/branch7x7_3", (7, 1), c7, 192),
            (f"{name}/branch7x7dbl_1", (1, 1), cin, c7),
            (f"{name}/branch7x7dbl_2", (7, 1), c7, c7),
            (f"{name}/branch7x7dbl_3", (1, 7), c7, c7),
            (f"{name}/branch7x7dbl_4", (7, 1), c7, c7),
            (f"{name}/branch7x7dbl_5", (1, 7), c7, 192),
            (f"{name}/branch_pool", (1, 1), cin, 192),
        ]
        cin = 192 * 4
    specs += [
        ("Mixed_7a/branch3x3_1", (1, 1), cin, 192),
        ("Mixed_7a/branch3x3_2", (3, 3), 192, 320),
        ("Mixed_7a/branch7x7x3_1", (1, 1), cin, 192),
        ("Mixed_7a/branch7x7x3_2", (1, 7), 192, 192),
        ("Mixed_7a/branch7x7x3_3", (7, 1), 192, 192),
        ("Mixed_7a/branch7x7x3_4", (3, 3), 192, 192),
    ]
    cin = 320 + 192 + cin
    for name in _MIXED_8:
        specs += [
            (f"{name}/branch1x1", (1, 1), cin, 320),
            (f"{name}/branch3x3_1", (1, 1), cin, 384),
            (f"{name}/branch3x3_2a", (1, 3), 384, 384),
            (f"{name}/branch3x3_2b", (3, 1), 384, 384),
            (f"{name}/branch3x3dbl_1", (1, 1), cin, 448),
            (f"{name}/branch3x3dbl_2", (3, 3), 448, 384),
            (f"{name}/branch3x3dbl_3a", (1, 3), 384, 384),
            (f"{name}/branch3x3dbl_3b", (3, 1), 384, 384),
            (f"{name}/branch_pool", (1, 1), cin, 192),
        ]
        cin = 320 + 2 * 384 + 2 * 384 + 192  # = 2048
    assert cin == FEATURE_DIM
    return specs


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def random_inception_params(seed: int = 0) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Fixed-seed He-normal random weights for the full trunk (identity BN).

    Exercises the real architecture without downloaded weights; FID numbers
    from it are deterministic but NOT comparable to published Inception FIDs.
    """
    key = jax.random.PRNGKey(seed)
    params = {}
    for scope, (kh, kw), cin, cout in conv_specs():
        key, k = jax.random.split(key)
        fan_in = kh * kw * cin
        params[scope] = {
            "w": (jax.random.normal(k, (kh, kw, cin, cout), jnp.float32)
                  * np.sqrt(2.0 / fan_in)),
            "beta": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        }
    return params


def load_inception_weights(path: str) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Load trunk weights from an ``.npz`` with ``<scope>/{w,beta,mean,var}``
    keys; every shape is validated against the architecture spec."""
    with np.load(path) as data:
        params = {}
        for scope, (kh, kw), cin, cout in conv_specs():
            unit = {}
            for field, shape in (("w", (kh, kw, cin, cout)),
                                 ("beta", (cout,)), ("mean", (cout,)),
                                 ("var", (cout,))):
                key = f"{scope}/{field}"
                if key not in data:
                    raise KeyError(
                        f"{path} is missing '{key}' — not an InceptionV3 "
                        f"weights file in this module's npz layout")
                arr = np.asarray(data[key], np.float32)
                if arr.shape != shape:
                    raise ValueError(
                        f"{key}: expected shape {shape}, got {arr.shape}")
                unit[field] = jnp.asarray(arr)
            params[scope] = unit
    return params


def find_local_weights(path: Optional[str] = None) -> Optional[str]:
    """Locate a local weights file: explicit path, ``$INCEPTION_WEIGHTS``,
    or ``$DATASETS_DIR/inception_v3.npz``."""
    candidates = [path, os.environ.get("INCEPTION_WEIGHTS"),
                  os.path.join(os.environ.get("DATASETS_DIR",
                                              os.path.expanduser("~/datasets")),
                               "inception_v3.npz")]
    for cand in candidates:
        if cand and os.path.exists(cand):
            return cand
    return None


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _conv_bn(params, x, scope: str, strides=(1, 1), padding="SAME"):
    p = params[scope]
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, p["w"], strides, padding,
                                     dimension_numbers=dn)
    # slim BatchNorm: no scale (gamma), eps 1e-3, inference statistics.
    inv = jax.lax.rsqrt(p["var"] + 1e-3)
    x = (x - p["mean"]) * inv + p["beta"]
    return jax.nn.relu(x)


def _max_pool(x, window=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), padding)


def _avg_pool_3x3_same(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1), "SAME")
    return s / counts


def _mixed_35(params, x, name: str):
    b0 = _conv_bn(params, x, f"{name}/branch1x1")
    b1 = _conv_bn(params, x, f"{name}/branch5x5_1")
    b1 = _conv_bn(params, b1, f"{name}/branch5x5_2")
    b2 = _conv_bn(params, x, f"{name}/branch3x3dbl_1")
    b2 = _conv_bn(params, b2, f"{name}/branch3x3dbl_2")
    b2 = _conv_bn(params, b2, f"{name}/branch3x3dbl_3")
    b3 = _conv_bn(params, _avg_pool_3x3_same(x), f"{name}/branch_pool")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _mixed_17(params, x, name: str):
    b0 = _conv_bn(params, x, f"{name}/branch1x1")
    b1 = _conv_bn(params, x, f"{name}/branch7x7_1")
    b1 = _conv_bn(params, b1, f"{name}/branch7x7_2")
    b1 = _conv_bn(params, b1, f"{name}/branch7x7_3")
    b2 = _conv_bn(params, x, f"{name}/branch7x7dbl_1")
    b2 = _conv_bn(params, b2, f"{name}/branch7x7dbl_2")
    b2 = _conv_bn(params, b2, f"{name}/branch7x7dbl_3")
    b2 = _conv_bn(params, b2, f"{name}/branch7x7dbl_4")
    b2 = _conv_bn(params, b2, f"{name}/branch7x7dbl_5")
    b3 = _conv_bn(params, _avg_pool_3x3_same(x), f"{name}/branch_pool")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _mixed_8(params, x, name: str):
    b0 = _conv_bn(params, x, f"{name}/branch1x1")
    b1 = _conv_bn(params, x, f"{name}/branch3x3_1")
    b1 = jnp.concatenate([_conv_bn(params, b1, f"{name}/branch3x3_2a"),
                          _conv_bn(params, b1, f"{name}/branch3x3_2b")], -1)
    b2 = _conv_bn(params, x, f"{name}/branch3x3dbl_1")
    b2 = _conv_bn(params, b2, f"{name}/branch3x3dbl_2")
    b2 = jnp.concatenate([_conv_bn(params, b2, f"{name}/branch3x3dbl_3a"),
                          _conv_bn(params, b2, f"{name}/branch3x3dbl_3b")], -1)
    b3 = _conv_bn(params, _avg_pool_3x3_same(x), f"{name}/branch_pool")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def inception_features(params, images) -> jnp.ndarray:
    """(N, H, W, 3) in [-1, 1], H = W ≥ 75 → (N, 2048) pool3 features."""
    x = images.astype(jnp.float32)
    x = _conv_bn(params, x, "Conv2d_1a_3x3", strides=(2, 2), padding="VALID")
    x = _conv_bn(params, x, "Conv2d_2a_3x3", padding="VALID")
    x = _conv_bn(params, x, "Conv2d_2b_3x3")
    x = _max_pool(x)
    x = _conv_bn(params, x, "Conv2d_3b_1x1", padding="VALID")
    x = _conv_bn(params, x, "Conv2d_4a_3x3", padding="VALID")
    x = _max_pool(x)
    for name, _ in _MIXED_35:
        x = _mixed_35(params, x, name)
    # Mixed_6a: stride-2 reduction 35→17.
    b0 = _conv_bn(params, x, "Mixed_6a/branch3x3", strides=(2, 2),
                  padding="VALID")
    b1 = _conv_bn(params, x, "Mixed_6a/branch3x3dbl_1")
    b1 = _conv_bn(params, b1, "Mixed_6a/branch3x3dbl_2")
    b1 = _conv_bn(params, b1, "Mixed_6a/branch3x3dbl_3", strides=(2, 2),
                  padding="VALID")
    x = jnp.concatenate([b0, b1, _max_pool(x)], axis=-1)
    for name, _ in _MIXED_17:
        x = _mixed_17(params, x, name)
    # Mixed_7a: stride-2 reduction 17→8.
    b0 = _conv_bn(params, x, "Mixed_7a/branch3x3_1")
    b0 = _conv_bn(params, b0, "Mixed_7a/branch3x3_2", strides=(2, 2),
                  padding="VALID")
    b1 = _conv_bn(params, x, "Mixed_7a/branch7x7x3_1")
    b1 = _conv_bn(params, b1, "Mixed_7a/branch7x7x3_2")
    b1 = _conv_bn(params, b1, "Mixed_7a/branch7x7x3_3")
    b1 = _conv_bn(params, b1, "Mixed_7a/branch7x7x3_4", strides=(2, 2),
                  padding="VALID")
    x = jnp.concatenate([b0, b1, _max_pool(x)], axis=-1)
    for name in _MIXED_8:
        x = _mixed_8(params, x, name)
    return jnp.mean(x, axis=(1, 2))  # global pool3 → (N, 2048)


# ---------------------------------------------------------------------------
# FID-facing entry points
# ---------------------------------------------------------------------------


def inception_feature_fn(weights_path: Optional[str] = None, *,
                         resize_to: Optional[int] = 299,
                         allow_random_fallback: bool = True,
                         seed: int = 0) -> Callable:
    """Build a jitted ``(N, H, W, C) -> (N, 2048)`` pool3 extractor for
    ``FIDMetric(feature_fn=...)``.

    Resolves weights via :func:`find_local_weights`; with none found and
    ``allow_random_fallback`` it uses fixed-seed random weights and says so
    loudly (numbers then deterministic but not externally comparable —
    mirroring the data pipeline's synthetic-fallback policy).
    """
    found = find_local_weights(weights_path)
    if found is not None:
        params = load_inception_weights(found)
        print(f"[fid] InceptionV3 weights: {found}")
    elif allow_random_fallback:
        params = random_inception_params(seed)
        print("[fid] no InceptionV3 weights found (set $INCEPTION_WEIGHTS or "
              "$DATASETS_DIR/inception_v3.npz) - using the real architecture "
              "with FIXED-SEED RANDOM weights; FID values are deterministic "
              "but NOT comparable to published numbers")
    else:
        raise FileNotFoundError(
            "no InceptionV3 weights file found (checked explicit path, "
            "$INCEPTION_WEIGHTS, $DATASETS_DIR/inception_v3.npz)")

    @jax.jit
    def extract(images):
        x = images.astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        if resize_to is not None and (x.shape[1], x.shape[2]) != (resize_to,
                                                                  resize_to):
            x = jax.image.resize(
                x, (x.shape[0], resize_to, resize_to, x.shape[-1]),
                method="bilinear")
        return inception_features(params, x)

    return extract


def save_inception_weights(params, path: str) -> None:
    """Write a params dict back to the npz layout (converter helper)."""
    flat = {}
    for scope, unit in params.items():
        for field, arr in unit.items():
            flat[f"{scope}/{field}"] = np.asarray(arr)
    np.savez(path, **flat)
