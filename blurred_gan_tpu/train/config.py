"""Training configuration dataclasses (reference: wgan.py:19-43,255-261;
blurred_gan.py:25-27).

Same nested-refinement pattern as the reference — each GAN flavour's hyperparameters
subclass the previous — with CLI flags and JSON sidecars via the mixins in
``utils.config``.
"""

from __future__ import annotations

from dataclasses import dataclass

from blurred_gan_tpu.utils.config import JsonSerializable, ParseableFromCommandLine


@dataclass
class TrainingConfig(JsonSerializable, ParseableFromCommandLine):
    """Run-level configuration (wgan.py:19-25)."""

    log_dir: str = "results/log"
    checkpoint_dir: str = ""  # empty -> <log_dir>/checkpoints
    save_image_summaries_interval: int = 50


@dataclass
class WGANHyperParameters(JsonSerializable, ParseableFromCommandLine):
    """WGAN.HyperParameters (wgan.py:34-43).

    ``ema_decay``: exponential moving average of the *generator* parameters,
    updated after every generator step (``ema = d·ema + (1−d)·params``) inside
    the jitted train step. 0 (the default) disables it and keeps the state
    layout identical to the reference's capture (wgan.py:70-71 has no EMA —
    this is a beyond-parity addition; EMA'd weights are the standard GAN
    practice for eval/sampling quality). When enabled, sample grids,
    ``Trainer.evaluate`` and ``generate_samples.py --ema`` use the averaged
    weights. Typical values 0.999–0.9999.
    """

    learning_rate: float = 0.001
    # TTUR (Heusel et al. 2017; beyond-parity, off at 0.0): a separate
    # generator learning rate. The reference shares one lr between both
    # networks (wgan.py:39-43,56-61); 0.0 keeps that parity default, any
    # other value gives the generator its own Adam schedule (the critic
    # keeps ``learning_rate``). Adam state layout is lr-independent, so
    # checkpoints remain structure-compatible either way.
    g_learning_rate: float = 0.0
    d_steps_per_g_step: int = 1
    batch_size: int = 32           # per replica
    global_batch_size: int = 32    # batch_size * num replicas
    optimizer: str = "adam"
    ema_decay: float = 0.0
    # Gradient accumulation (beyond-parity, off at 1): one optimizer update
    # per step, gradients summed over K microbatches inside a lax.scan, so
    # peak activation memory scales with global_batch_size/K. Latents and GP
    # interpolates are the full-batch draws sliced per microbatch — with a
    # dropout-free critic the discriminator update is exactly the full-batch
    # update (tests/test_grad_accum.py); generator BatchNorm normalises per
    # microbatch (standard accumulation semantics). Lets HBM-bound configs
    # (512² is b8-physical on a v5e) train at large effective batch.
    grad_accumulation_steps: int = 1
    # Mirror augmentation (beyond-parity, off by default): per-sample 50%
    # horizontal flip of the reals, applied on device inside the jitted step
    # (the uint8 host->device stream and chunked mode are untouched). The
    # standard CelebA/face-dataset practice (ProGAN trains with it); NOT for
    # MNIST (digits are chiral).
    flip_augment: bool = False


@dataclass
class WGANGPHyperParameters(WGANHyperParameters):
    """WGANGP.HyperParameters (wgan.py:255-261).

    ``reference_grad_scale``: reproduce the reference's accidental ×B critic
    gradient (its (B,)-vector loss is implicitly summed by TF's tape,
    wgan.py:282-284). Off by default — Adam makes the two gradients train
    identically while the default logs the loss the reference's own Mean
    metric shows; see losses/wgan.py and tests/test_grad_parity.py.
    """

    e_drift: float = 1e-4
    gp_coefficient: float = 10.0
    reference_grad_scale: bool = False
    # Lazy regularisation (beyond-parity, off by default): apply the gradient
    # penalty only every N critic steps, scaled by N so the time-averaged
    # regularisation pressure is unchanged (the StyleGAN2 lazy-R1 argument
    # applied to WGAN-GP). N=1 keeps the reference's every-step semantics and
    # compiles to the identical straight-line program; N>1 skips the GP
    # double-backward — the most expensive part of the critic update — on
    # (N-1)/N of the steps.
    gp_every_n_steps: int = 1


@dataclass
class BlurredWGANGPHyperParameters(WGANGPHyperParameters):
    """BlurredGAN.HyperParameters (blurred_gan.py:25-27)."""

    initial_blur_std: float = 0.05
