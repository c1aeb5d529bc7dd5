"""TTUR (separate generator learning rate; beyond-parity — the reference
shares one Adam lr between both networks, wgan.py:39-43,56-61).

Pins: g_learning_rate=0 (the default) and g_learning_rate == learning_rate
are the identical program numerically; a different g lr changes ONLY the
generator update (critic trajectory of step 1 is untouched); checkpoint
state layout is unchanged (Adam state is lr-independent).
"""

import jax
import jax.numpy as jnp
import numpy as np

from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    create_train_state,
    make_train_step,
)


def micro_gan():
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                       blocks=((32, 2), (16, 2)), out_channels=1,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(16, 32))
    return GAN(g, d, latent_size=16, blurred=True)


def hparams(**kw):
    kw.setdefault("batch_size", 8)
    kw.setdefault("global_batch_size", 8)
    kw.setdefault("learning_rate", 1e-3)
    return BlurredWGANGPHyperParameters(**kw)


def one_step(hp):
    gan = micro_gan()
    state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
    step = make_train_step(gan, hp, donate_state=False)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                               jnp.float32, -1.0, 1.0)
    state, metrics, _ = step(state, reals, jnp.float32(0.5),
                             jax.random.PRNGKey(100))
    return state, metrics


def _all_equal(a, b):
    return all(np.array_equal(x, y) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_explicit_equal_g_lr_is_identity():
    s0, _ = one_step(hparams())
    s1, _ = one_step(hparams(g_learning_rate=1e-3))
    assert _all_equal(s0.g_params, s1.g_params)
    assert _all_equal(s0.d_params, s1.d_params)


def test_different_g_lr_changes_only_generator():
    s0, m0 = one_step(hparams())
    s1, m1 = one_step(hparams(g_learning_rate=1e-4))
    # Same RNG stream, same critic lr: the first critic update is identical.
    assert _all_equal(s0.d_params, s1.d_params)
    assert np.allclose(float(m0["disc_loss"]), float(m1["disc_loss"]))
    # The generator update differs (smaller Adam step).
    assert not _all_equal(s0.g_params, s1.g_params)
    # State layout unchanged: checkpoints stay structure-compatible.
    assert (jax.tree_util.tree_structure(s0.g_opt_state)
            == jax.tree_util.tree_structure(s1.g_opt_state))


def test_ttur_composes_with_grad_accum():
    hp = hparams(g_learning_rate=1e-4, grad_accumulation_steps=2)
    state, metrics = one_step(hp)
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["gen_loss"]))
