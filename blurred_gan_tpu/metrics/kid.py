"""Kernel Inception Distance (KID) — unbiased MMD² between feature sets.

Bińkowski et al., "Demystifying MMD GANs" (ICLR 2018). FID's Gaussian
assumption and its O(n⁻¹)-biased estimator make small-sample scores
incomparable across n; KID is the squared Maximum Mean Discrepancy under
the paper's default cubic polynomial kernel

    k(x, y) = (xᵀy / d + 1)³        (d = feature dimension)

with the *unbiased* U-statistic estimator, so its expectation is
independent of sample count — the right companion to FID for the 1k-sample
protocols this repo's quality harnesses use. The reference implements FID
and SWD only (/root/reference/metrics.py) — beyond-parity.

TPU-native formulation: each subset's estimate is three m×m Gram matmuls
(MXU work) plus masked means, in one jitted program reused across subsets.
Following the paper's protocol the score is reported as mean ± std over
``n_subsets`` random subsets of size ``subset_size`` (100 × 1000 by
default, clamped to the available sample count).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def _mmd2_poly3(x, y):
    """Unbiased MMD² with the cubic polynomial kernel over (m, D) subsets."""
    m = x.shape[0]
    d = x.shape[1]
    kxx = (x @ x.T / d + 1.0) ** 3
    kyy = (y @ y.T / d + 1.0) ** 3
    kxy = (x @ y.T / d + 1.0) ** 3
    offdiag = 1.0 - jnp.eye(m, dtype=x.dtype)
    denom = m * (m - 1)
    return (jnp.sum(kxx * offdiag) / denom
            + jnp.sum(kyy * offdiag) / denom
            - 2.0 * jnp.mean(kxy))


def kid(real_features, fake_features, n_subsets: int = 100,
        subset_size: int = 1000, seed: int = 0) -> Dict[str, float]:
    """KID over two (N, D)/(M, D) feature matrices.

    Returns ``{"kid": mean, "kid_std": std}`` over ``n_subsets`` subsets of
    ``subset_size`` samples (drawn without replacement per subset, fixed
    ``seed`` — deterministic across calls). ``subset_size`` is clamped to
    ``min(N, M)`` so small sets degrade to fewer-but-valid estimates rather
    than erroring.
    """
    real = jnp.asarray(real_features, jnp.float32)
    fake = jnp.asarray(fake_features, jnp.float32)
    if real.ndim != 2 or fake.ndim != 2 or real.shape[1] != fake.shape[1]:
        raise ValueError(f"expected (N, D)/(M, D) feature matrices with "
                         f"equal D, got {real.shape} / {fake.shape}")
    if min(real.shape[0], fake.shape[0]) < 2:
        raise ValueError("KID needs at least 2 samples per side "
                         f"(got {real.shape[0]} / {fake.shape[0]})")
    if subset_size < 2:
        raise ValueError("KID's unbiased U-statistic divides by m(m-1): "
                         f"subset_size must be >= 2, got {subset_size}")
    m = int(min(subset_size, real.shape[0], fake.shape[0]))
    if m == real.shape[0] and m == fake.shape[0]:
        # Degenerate clamp: every without-replacement subset IS the full
        # set (the estimator is permutation-invariant), so all n_subsets
        # estimates would be identical — compute the one exact value.
        n_subsets = 1
    rng = np.random.RandomState(seed)
    vals = []
    for _ in range(int(n_subsets)):
        ri = rng.choice(real.shape[0], m, replace=False)
        fi = rng.choice(fake.shape[0], m, replace=False)
        vals.append(_mmd2_poly3(real[ri], fake[fi]))
    vals = np.asarray(jax.device_get(vals), np.float64)
    return {"kid": float(vals.mean()), "kid_std": float(vals.std())}


def kid_from_images(reals, fakes, feature_fn: Optional[Callable] = None,
                    n_subsets: int = 100, subset_size: int = 1000,
                    batch: int = 100, feature_dim: int = 2048,
                    seed: int = 0) -> Dict[str, float]:
    """KID over NHWC image sets, through the same extractors FID uses
    (fixed-seed random-conv by default; pass ``inception_feature_fn(...)``
    for the InceptionV3 trunk)."""
    from blurred_gan_tpu.metrics.fid import random_conv_features

    if feature_fn is None:
        feature_fn = random_conv_features(reals.shape[1:], dim=feature_dim)

    def extract(x):
        outs = [np.asarray(feature_fn(x[i:i + batch]))
                for i in range(0, len(x), batch)]
        return np.concatenate(outs, axis=0)

    return kid(extract(reals), extract(fakes), n_subsets=n_subsets,
               subset_size=subset_size, seed=seed)
