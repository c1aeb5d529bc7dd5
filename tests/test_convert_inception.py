"""Tests for tools/convert_inception.py (round-2 VERDICT missing #3).

The torchvision path is validated two independent ways:

1. an exact algebraic round-trip of the γ-folding recipe, and
2. a features head-to-head against torchvision's own ``inception_v3``
   forward pass — which simultaneously cross-validates this repo's JAX
   trunk architecture (metrics/inception.py) against an independent
   implementation of the same network.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import convert_inception as ci  # noqa: E402

from blurred_gan_tpu.metrics.inception import (  # noqa: E402
    conv_specs,
    inception_features,
    random_inception_params,
    save_inception_weights,
)

torch = pytest.importorskip("torch")


def _fake_torchvision_sd(params, gammas):
    """Invert the converter's mapping: a state dict that, γ-folded, must
    reproduce ``params`` exactly."""
    sd = {}
    for scope, (kh, kw), cin, cout in conv_specs():
        mod = scope.replace("/", ".")
        p = params[scope]
        g = gammas[scope]
        w_hwio = np.asarray(p["w"], np.float32) / g[None, None, None, :]
        sd[f"{mod}.conv.weight"] = torch.tensor(
            w_hwio.transpose(3, 2, 0, 1))  # HWIO -> OIHW
        sd[f"{mod}.bn.weight"] = torch.tensor(g)
        sd[f"{mod}.bn.bias"] = torch.tensor(np.asarray(p["beta"], np.float32))
        sd[f"{mod}.bn.running_mean"] = torch.tensor(
            np.asarray(p["mean"], np.float32) / g)
        sd[f"{mod}.bn.running_var"] = torch.tensor(
            np.asarray(p["var"], np.float32))
    return sd


class TestTorchvisionConversion:
    def test_gamma_folding_roundtrip_exact(self):
        params = random_inception_params(seed=3)
        rng = np.random.RandomState(0)
        gammas = {scope: (0.5 + rng.rand(cout)).astype(np.float32)
                  for scope, _, _, cout in conv_specs()}
        sd = _fake_torchvision_sd(params, gammas)
        out = ci.convert_torchvision_state_dict(sd)
        for scope in params:
            for field in ("w", "beta", "mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(out[scope][field]),
                    np.asarray(params[scope][field]),
                    rtol=2e-6, atol=1e-7, err_msg=f"{scope}/{field}")

    def test_missing_key_fails_loudly(self):
        sd = _fake_torchvision_sd(random_inception_params(seed=1), {
            scope: np.ones(cout, np.float32)
            for scope, _, _, cout in conv_specs()})
        del sd["Mixed_6b.branch7x7_2.conv.weight"]
        with pytest.raises(KeyError, match="Mixed_6b/branch7x7_2"):
            ci.convert_torchvision_state_dict(sd)

    def test_features_match_real_torchvision_model(self):
        """Convert an actual torchvision inception_v3's random-init weights
        and check OUR trunk reproduces ITS pre-fc features — validates the
        name map, the γ folding and the JAX architecture all at once."""
        torchvision = pytest.importorskip("torchvision")

        model = torchvision.models.inception_v3(
            weights=None, aux_logits=True, init_weights=True)
        model.eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = ci.convert_torchvision_state_dict(sd)

        x = np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32)
        x = x * 2 - 1  # [-1, 1], the trunk's input range

        with torch.no_grad():
            t = torch.tensor(x.transpose(0, 3, 1, 2))
            # torchvision forward up to the 2048-d pre-fc vector (eval mode:
            # dropout is identity). Mirrors Inception3.forward without the
            # 299-specific input transform (transform_input=False default).
            m = model
            for mod in [m.Conv2d_1a_3x3, m.Conv2d_2a_3x3, m.Conv2d_2b_3x3,
                        m.maxpool1, m.Conv2d_3b_1x1, m.Conv2d_4a_3x3,
                        m.maxpool2, m.Mixed_5b, m.Mixed_5c, m.Mixed_5d,
                        m.Mixed_6a, m.Mixed_6b, m.Mixed_6c, m.Mixed_6d,
                        m.Mixed_6e, m.Mixed_7a, m.Mixed_7b, m.Mixed_7c]:
                t = mod(t)
            ref = torch.mean(t, dim=(2, 3)).numpy()  # adaptive avgpool 1x1

        ours = np.asarray(inception_features(
            {k: {f: jnp.asarray(a) for f, a in u.items()}
             for k, u in params.items()}, jnp.asarray(x)))
        assert ours.shape == ref.shape == (2, 2048)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


class TestNpzAndCli:
    def test_npz_validate_and_resave(self, tmp_path):
        params = random_inception_params(seed=5)
        src = str(tmp_path / "in.npz")
        out = str(tmp_path / "out.npz")
        save_inception_weights(params, src)
        ci.convert(src, out, fmt="npz")
        from blurred_gan_tpu.metrics.inception import load_inception_weights

        loaded = load_inception_weights(out)
        np.testing.assert_array_equal(
            np.asarray(loaded["Conv2d_1a_3x3"]["w"]),
            np.asarray(params["Conv2d_1a_3x3"]["w"]))

    def test_format_detection(self, tmp_path):
        assert ci.detect_format("weights.npz") == "npz"
        assert ci.detect_format("model.pth") == "torchvision"
        assert ci.detect_format("inception_v3.ckpt") == "slim"
        d = tmp_path / "ckptdir"
        d.mkdir()
        assert ci.detect_format(str(d)) == "slim"


class TestSlimNameMap:
    def test_full_coverage_and_quirks(self):
        names = [ci._slim_name(scope) for scope, _, _, _ in conv_specs()]
        assert len(names) == len(set(names)) == 94  # distinct, total
        assert all(n.startswith("InceptionV3/") for n in names)
        # The documented historic quirks (inception.py:30-33).
        assert ci._slim_name("Mixed_5c/branch5x5_1") == \
            "InceptionV3/Mixed_5c/Branch_1/Conv2d_0b_1x1"
        assert ci._slim_name("Mixed_5c/branch5x5_2") == \
            "InceptionV3/Mixed_5c/Branch_1/Conv_1_0c_5x5"
        assert ci._slim_name("Mixed_6a/branch3x3") == \
            "InceptionV3/Mixed_6a/Branch_0/Conv2d_1a_1x1"
        assert ci._slim_name("Mixed_6a/branch3x3dbl_2") == \
            "InceptionV3/Mixed_6a/Branch_1/Conv2d_0b_3x3"
