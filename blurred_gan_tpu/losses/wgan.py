"""WGAN / WGAN-GP losses as pure functions (reference: /root/reference/wgan.py).

Semantics preserved from the reference:
- losses are ``sum(...) / global_batch_size`` (wgan.py:130,157) — the canonical
  per-replica scaling so that a cross-replica sum-reduction yields the global mean;
  under global-array jit we compute the global sum directly and XLA inserts the psum.
- gradient penalty (wgan.py:234-246): per-sample uniform interpolation coefficient of
  shape (B,1,1,1); the critic is evaluated in *inference* mode (no dropout) inside the
  penalty; the L2 norm is over the flattened per-sample gradient; penalty is
  ``mean((||g|| - 1)^2)``. The outer loss gradient differentiates *through* this inner
  gradient (grad-of-grad), exactly as TF's nested GradientTape does.
- in the Blurred variants the critic callable already contains the blur, so reals,
  fakes **and the GP interpolates** are all blurred (blurred_gan.py:31-34 semantics),
  while x_hat itself is formed from *pre-blur* images.
- drift term (wgan.py:282-284): ``e_drift * (|fake_score| + |real_score|)``. The
  reference accidentally leaves this per-sample, turning its loss into a (B,)-vector
  that TF's tape implicitly sums (scaling base+GP by B in the gradient). We keep the
  reference's |score| formula but reduce with a batch *mean*, which matches the loss
  value the reference logs (its metric takes the mean) without the accidental B-fold
  gradient scaling — listed as a fix-not-reproduce quirk in SURVEY.md §2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wgan_discriminator_loss(real_scores, fake_scores, global_batch_size):
    """sum(fake - real) / global_batch_size (wgan.py:128-130)."""
    return jnp.sum(fake_scores - real_scores) / global_batch_size


def wgan_generator_loss(fake_scores, global_batch_size):
    """-sum(fake) / global_batch_size (wgan.py:155-157)."""
    return -jnp.sum(fake_scores) / global_batch_size


def gradient_penalty(critic_fn, reals, fakes, rng, *, alpha=None):
    """WGAN-GP interpolation penalty (wgan.py:234-246).

    ``critic_fn`` maps a batch of images to per-sample scores and must already be in
    inference mode (dropout off) and, for blurred variants, include the blur.
    Returns a scalar; differentiable a second time by the outer loss gradient.

    ``alpha`` optionally pins the per-sample interpolation coefficients
    ((B,1,1,1)) instead of sampling them from ``rng`` — used by the
    cross-framework gradient-parity tests, which must feed the reference's TF
    implementation and this one the *same* interpolates.
    """
    batch = reals.shape[0]
    a = (jax.random.uniform(rng, (batch, 1, 1, 1), dtype=reals.dtype)
         if alpha is None else jnp.asarray(alpha, reals.dtype))
    x_hat = reals + a * (fakes - reals)

    # Per-sample grads: scores are per-sample independent, so grad of the summed
    # score w.r.t. x_hat gives each sample's gradient (inner backward of the
    # double-backward).
    grads = jax.grad(lambda x: jnp.sum(critic_fn(x)))(x_hat)
    norms = jnp.sqrt(jnp.sum(grads.reshape(batch, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def wgangp_discriminator_loss(critic_fn_eval, reals, fakes, real_scores,
                              fake_scores, rng, *, global_batch_size,
                              gp_coefficient=10.0, e_drift=1e-4,
                              alpha=None, reference_grad_scale=False,
                              include_gp=True):
    """Full WGAN-GP critic loss (wgan.py:272-285). Returns (loss, aux dict).

    ``reference_grad_scale=True`` reproduces the reference's *gradient*
    semantics exactly: its loss is an accidental (B,)-vector (the per-sample
    drift broadcast, wgan.py:282-284) that TF's tape implicitly sums, so its
    critic gradient is precisely B × this function's default gradient
    (measured by tests/test_grad_parity.py). Since Σ = B·mean distributes
    over all three terms, the compat mode is a single ×B on the loss. Adam is
    invariant to constant gradient scaling (up to eps=1e-7 resolution), which
    is why the default mean semantics train identically while logging the
    same loss value as the reference's Mean metric.
    """
    base = wgan_discriminator_loss(real_scores, fake_scores, global_batch_size)
    # ``include_gp`` is a Python-static switch (lazy regularisation,
    # hparams.gp_every_n_steps): False builds the loss graph WITHOUT the
    # penalty's double-backward — the point of skipping — rather than
    # multiplying it by zero and hoping DCE removes it.
    gp_term = (gp_coefficient * gradient_penalty(critic_fn_eval, reals, fakes,
                                                 rng, alpha=alpha)
               if include_gp else jnp.float32(0.0))
    norm_term = e_drift * jnp.mean(jnp.abs(fake_scores) + jnp.abs(real_scores))
    loss = base + gp_term + norm_term
    if reference_grad_scale:
        loss = loss * fake_scores.shape[0]
    return loss, {"wgan_loss": base, "gp_term": gp_term, "norm_term": norm_term}
