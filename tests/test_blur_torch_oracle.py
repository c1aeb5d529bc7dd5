"""Cross-framework blur oracle in PyTorch (CPU).

The reference keeps a PyTorch prototype of the separable blur as a second
implementation of the same math (/root/reference/pytorch/gaussianblur.py) —
"useful as a cross-framework numeric oracle" (SURVEY.md §2 #18). This is our
equivalent: an independent torch implementation of the separable depthwise
Gaussian blur with the reference's sizing policy, checked against the JAX op.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from blurred_gan_tpu.ops.blur import blur_images  # noqa: E402


def torch_blur(x_nhwc: np.ndarray, scale: float) -> np.ndarray:
    """Independent separable depthwise blur with the reference sizing policy
    (floor(6σ)+1, clip [3, res], σ = (k−1)/6 floored at 0.01; taps at integer
    offsets −k//2..k//2; zero-padded SAME)."""
    n, h, w, c = x_nhwc.shape
    res = max(h, w)
    k = int(np.clip(np.floor(6.0 * scale) + 1.0, 3.0, float(res)))
    sigma = max((k - 1.0) / 6.0, 0.01)
    half = k // 2
    offs = torch.arange(-half, half + 1, dtype=torch.float64)
    g = torch.exp(-(offs ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).to(torch.float32)
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).contiguous()
    taps = g.numel()
    k_row = g.view(1, 1, 1, taps).repeat(c, 1, 1, 1)
    k_col = g.view(1, 1, taps, 1).repeat(c, 1, 1, 1)
    y = F.conv2d(x, k_row, padding=(0, half), groups=c)
    z = F.conv2d(y, k_col, padding=(half, 0), groups=c)
    return np.transpose(z.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("scale", [0.05, 0.9, 2.0, 4.7])
@pytest.mark.parametrize("shape", [(2, 28, 28, 1), (1, 32, 32, 3)])
def test_blur_matches_torch_oracle(scale, shape):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    want = torch_blur(x, scale)
    got = np.asarray(blur_images(jnp.asarray(x), jnp.float32(scale),
                                 impl="einsum"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_large_sigma_clip_regime_matches():
    # σ large enough that the kernel clips at the full resolution and σ is
    # re-derived (gaussian_blur.py:67-72 policy).
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 1).astype(np.float32)
    want = torch_blur(x, 100.0)
    got = np.asarray(blur_images(jnp.asarray(x), jnp.float32(100.0),
                                 impl="einsum"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
