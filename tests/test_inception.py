"""InceptionV3 trunk tests (VERDICT.md round-1 missing #1).

No network egress means no pretrained weights in CI, so these validate the
*architecture* (the reference's TF-Hub pool3 feature vector,
/root/reference/metrics.py:169-170): exact canonical trunk parameter count,
2048-d output, weights-file round-trip/validation, and FID integration.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blurred_gan_tpu.metrics import FIDMetric
from blurred_gan_tpu.metrics.inception import (
    FEATURE_DIM,
    conv_specs,
    find_local_weights,
    inception_feature_fn,
    inception_features,
    load_inception_weights,
    random_inception_params,
    save_inception_weights,
)


@pytest.fixture(scope="module")
def params():
    return random_inception_params(seed=0)


class TestArchitecture:
    def test_canonical_trunk_param_count(self):
        # InceptionV3 feature trunk (conv + BN up to pool3, no fc/aux) has
        # exactly 21,802,784 parameters — the published figure for the
        # network the reference's TF-Hub module wraps.
        specs = conv_specs()
        n = sum(kh * kw * cin * cout + 3 * cout
                for _, (kh, kw), cin, cout in specs)
        assert len(specs) == 94
        assert n == 21_802_784

    def test_channel_chain_is_consistent(self):
        # The final 8x8 block concatenates to the 2048-d pool3 width
        # (conv_specs() itself asserts the running channel chain).
        last = {s: cout for s, _, _, cout in conv_specs()
                if s.startswith("Mixed_7c/")}
        assert (last["Mixed_7c/branch1x1"]
                + 2 * last["Mixed_7c/branch3x3_2a"]
                + 2 * last["Mixed_7c/branch3x3dbl_3a"]
                + last["Mixed_7c/branch_pool"]) == FEATURE_DIM

    def test_features_shape_and_determinism(self, params):
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 75, 75, 3),
                               jnp.float32, -1, 1)
        f1 = jax.jit(inception_features)(params, x)
        f2 = jax.jit(inception_features)(params, x)
        assert f1.shape == (2, FEATURE_DIM)
        assert np.isfinite(np.asarray(f1)).all()
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_distinct_inputs_distinct_features(self, params):
        k = jax.random.PRNGKey(2)
        x = jax.random.uniform(k, (2, 75, 75, 3), jnp.float32, -1, 1)
        f = np.asarray(jax.jit(inception_features)(params, x))
        assert not np.allclose(f[0], f[1])


class TestWeightsIO:
    def test_save_load_roundtrip(self, params, tmp_path):
        path = str(tmp_path / "inception_v3.npz")
        save_inception_weights(params, path)
        loaded = load_inception_weights(path)
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 75, 75, 3),
                               jnp.float32, -1, 1)
        f_orig = jax.jit(inception_features)(params, x)
        f_load = jax.jit(inception_features)(loaded, x)
        np.testing.assert_allclose(np.asarray(f_orig), np.asarray(f_load),
                                   rtol=1e-6, atol=1e-6)

    def test_missing_key_rejected(self, tmp_path):
        path = str(tmp_path / "bad.npz")
        np.savez(path, **{"Conv2d_1a_3x3/w": np.zeros((3, 3, 3, 32),
                                                      np.float32)})
        with pytest.raises(KeyError, match="missing"):
            load_inception_weights(path)

    def test_wrong_shape_rejected(self, params, tmp_path):
        path = str(tmp_path / "warped.npz")
        flat = {}
        for scope, unit in params.items():
            for field, arr in unit.items():
                flat[f"{scope}/{field}"] = np.asarray(arr)
        flat["Conv2d_2a_3x3/w"] = np.zeros((3, 3, 32, 99), np.float32)
        np.savez(path, **flat)
        with pytest.raises(ValueError, match="expected shape"):
            load_inception_weights(path)

    def test_find_local_weights_env(self, params, tmp_path, monkeypatch):
        path = str(tmp_path / "inception_v3.npz")
        save_inception_weights(params, path)
        monkeypatch.delenv("INCEPTION_WEIGHTS", raising=False)
        monkeypatch.setenv("DATASETS_DIR", str(tmp_path))
        assert find_local_weights() == path
        monkeypatch.setenv("INCEPTION_WEIGHTS", path)
        assert find_local_weights() == path
        monkeypatch.setenv("DATASETS_DIR", str(tmp_path / "nope"))
        monkeypatch.delenv("INCEPTION_WEIGHTS", raising=False)
        assert find_local_weights() is None

    def test_no_weights_no_fallback_raises(self, monkeypatch, tmp_path):
        monkeypatch.delenv("INCEPTION_WEIGHTS", raising=False)
        monkeypatch.setenv("DATASETS_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError):
            inception_feature_fn(allow_random_fallback=False)


class TestFIDIntegration:
    def test_fid_with_inception_extractor(self, monkeypatch, tmp_path):
        monkeypatch.delenv("INCEPTION_WEIGHTS", raising=False)
        monkeypatch.setenv("DATASETS_DIR", str(tmp_path))
        # resize_to=None: feed native 75x75 (fast); grayscale is tiled to RGB.
        fn = inception_feature_fn(resize_to=None)
        rng = np.random.RandomState(0)
        reals = rng.rand(8, 75, 75, 1).astype(np.float32) * 2 - 1
        close = np.clip(reals + 0.05 * rng.randn(*reals.shape), -1,
                        1).astype(np.float32)
        far = rng.rand(8, 75, 75, 1).astype(np.float32) * 2 - 1

        m = FIDMetric(feature_fn=fn)
        m.update_state(reals, reals)
        fid_same = m.result()
        m.reset_states()
        m.update_state(reals, close)
        fid_close = m.result()
        m.reset_states()
        m.update_state(reals, far)
        fid_far = m.result()
        assert fid_same == pytest.approx(0.0, abs=1e-2)
        assert fid_same <= fid_close <= fid_far
