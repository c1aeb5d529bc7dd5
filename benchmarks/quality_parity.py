"""Golden quality trajectories: the reference vs this framework, same corpus,
same σ schedule, same metric stack (VERDICT.md round-1 next #2; the
BASELINE.json north-star "SWD & FID within 5%" measurement).

Three subcommands, designed to run independently (the reference's CPU training
is the long pole and runs in the background):

    python benchmarks/quality_parity.py train_ref  --config mnist --examples 60000 --out /tmp/qp
    python benchmarks/quality_parity.py train_ours --config mnist --examples 60000 --out /tmp/qp
    python benchmarks/quality_parity.py evaluate   --config mnist --out /tmp/qp [--seeds 0,1]

``--config`` selects the head-to-head surface (round-2 VERDICT #1: the
original harness hard-coded MNIST-28; the reference's flagship is CelebA):

- ``mnist``    — the MNIST-28 demo config (/root/reference/demo_mnist.py:91-219):
  28×28×1, σ₀ = initial_blur_std = 0.05 (demo_mnist.py:199), 60k-example corpus.
- ``celeba64`` — the CelebA demo config at 64²: the CelebA architectures
  with one fewer stage per side (exactly this repo's model zoo at
  resolution=64), σ₀ = 5 exactly as the CelebA demo hard-codes it
  (/root/reference/demo_celeba.py:226), 20k-example 64×64×3 corpus (matching
  the synthetic-CelebA fallback cap; 60k examples = 3 corpus epochs).
- ``celeba128`` — the reference's FLAGSHIP config verbatim
  (/root/reference/demo_celeba.py:51-124,226): the full 6-stage DCGAN pair
  at 128×128×3, σ₀ = 5, 20k-example corpus. The reference side trains at
  ~7-8 img/s on this container's CPU (~2.2 h per 60k-example seed) — long
  but background-feasible, so the flagship surface is measured directly
  rather than approximated at 64².
- ``celeba64_sharp`` — the same CelebA-64 surface in the SHARP regime:
  σ₀ = 0.05, the reference's own dataclass default ``initial_blur_std``
  (/root/reference/blurred_gan.py:27 — the value demo_mnist.py:199 trains
  with). Rationale: with the σ₀=5 configs the 60k-example horizon decays σ
  only 5.0 → 4.94 (the reference's schedule evaluates ExponentialDecay at
  the *batch* counter, callbacks.py:60-62), so those head-to-heads measure
  the heavy-blur curriculum phase where per-seed scatter dominates. At
  σ₀ = 0.05 the 3-tap kernel is near-identity from step one, so this config
  measures the regime where the generators' fine detail actually
  differentiates — the CelebA-scale analogue of the MNIST comparison.

``train_ref`` trains the reference BlurredWGANGP on the SAME deterministic
synthetic corpus the framework's demos fall back to (no egress in this
container), driving its blur σ with the same open-loop schedule both demos
use. ``train_ours`` trains this framework's matching config identically.
``evaluate`` scores each model's 1000 generated samples against the same 1000
held-out-order reals with the SAME metric implementations (our SWD + our
streaming FID with the shared fixed-seed extractor), plus a reals-vs-reals
floor, and prints one JSON line per row.

Both trainings use their framework's OWN RNG streams (TF vs JAX), so parity
is statistical, not bitwise: run multiple seeds (--seed) for error bars.
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
BATCH = 32
LATENT = 100
N_EVAL = 1000


@dataclasses.dataclass(frozen=True)
class ParityConfig:
    name: str
    image_shape: tuple
    corpus_n: int
    sigma0: float  # BlurDecayController max_value for this demo config
    arch: str = ""  # architecture key (defaults to name), e.g. "celeba64"

    def __post_init__(self):
        if not self.arch:
            object.__setattr__(self, "arch", self.name)


CONFIGS = {
    "mnist": ParityConfig("mnist", (28, 28, 1), 60_000, 0.05),
    "celeba64": ParityConfig("celeba64", (64, 64, 3), 20_000, 5.0),
    "celeba128": ParityConfig("celeba128", (128, 128, 3), 20_000, 5.0),
    # Sharp regime: the reference's dataclass-default initial_blur_std
    # (blurred_gan.py:27) on the CelebA-64 architectures — see module doc.
    "celeba64_sharp": ParityConfig("celeba64_sharp", (64, 64, 3),
                                   20_000, 0.05, arch="celeba64"),
    # The flagship resolution in the sharp regime (round-4 VERDICT next #5):
    # the last missing cell of the quality matrix — 128² was only ever
    # compared under the heavy-blur curriculum (σ 5.0→4.94), where per-seed
    # scatter dominates; this measures the full 6-stage pair
    # (/root/reference/demo_celeba.py:51-124) where fine detail counts.
    "celeba128_sharp": ParityConfig("celeba128_sharp", (128, 128, 3),
                                    20_000, 0.05, arch="celeba128"),
}


def _corpus(cfg: ParityConfig):
    sys.path.insert(0, REPO)
    from blurred_gan_tpu.data.pipeline import synthetic_dataset

    return synthetic_dataset(cfg.image_shape, num_examples=cfg.corpus_n)


def _sigma_controller(cfg: ParityConfig, total_examples: int):
    sys.path.insert(0, REPO)
    from blurred_gan_tpu.sched.blur import BlurDecayController

    # mnist: max_value = initial_blur_std (demo_mnist.py:199, default 0.05);
    # celeba: max_value = 5 hard-coded (demo_celeba.py:226).
    return BlurDecayController(total_n_training_examples=total_examples,
                               max_value=cfg.sigma0)


def _our_models(cfg: ParityConfig, compute_dtype=None,
                upsample: str = "transpose"):
    import jax.numpy as jnp

    from blurred_gan_tpu.models import (celeba_discriminator,
                                        celeba_generator,
                                        mnist_discriminator, mnist_generator)

    dt = compute_dtype or jnp.float32
    if cfg.arch == "mnist":
        return (mnist_generator(compute_dtype=dt, upsample=upsample),
                mnist_discriminator(compute_dtype=dt))
    res = cfg.image_shape[0]
    return (celeba_generator(res, compute_dtype=dt, upsample=upsample),
            celeba_discriminator(res, compute_dtype=dt))


def _eval_latents(seed: int = 123) -> np.ndarray:
    # Uniform [0,1) — the latent prior of both frameworks (wgan.py:116-118).
    return np.random.RandomState(seed).rand(N_EVAL, LATENT).astype(np.float32)


def train_ref(cfg: ParityConfig, examples: int, out: str, seed: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import reference_baseline

    reference_baseline._install_stubs()
    sys.path.insert(0, REF)
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    tf.keras.utils.set_random_seed(seed)
    gan, _ = reference_baseline.build_reference_gan(
        cfg.arch, os.path.join(out, f"ref_log_s{seed}"))
    ds = _corpus(cfg)
    ctrl = _sigma_controller(cfg, examples)

    t0 = time.time()
    n_batches = 0
    for batch in ds.batches(BATCH, seed=seed):
        if n_batches * BATCH >= examples:
            break
        sigma = ctrl.sigma(n_batches)
        gan.blur.std.assign(sigma)
        x = tf.convert_to_tensor(batch.astype(np.float32) / 127.5 - 1.0)
        gan.train_on_batch(x)
        n_batches += 1
        if n_batches % 100 == 0:
            rate = n_batches * BATCH / (time.time() - t0)
            print(f"[ref seed{seed}] {n_batches * BATCH}/{examples} examples "
                  f"({rate:.1f} img/s) sigma={sigma:.4f}", flush=True)
    elapsed = time.time() - t0

    latents = _eval_latents()
    samples = np.concatenate(
        [gan.generator(tf.convert_to_tensor(latents[i:i + 100]),
                       training=False).numpy()
         for i in range(0, N_EVAL, 100)])
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, f"ref_samples_s{seed}.npz"), samples=samples)
    meta = {"framework": "reference-tf", "config": cfg.name, "seed": seed,
            "examples": examples,
            "images_per_sec": round(examples / elapsed, 2),
            "elapsed_s": round(elapsed, 1)}
    with open(os.path.join(out, f"ref_meta_s{seed}.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


def train_ours(cfg: ParityConfig, examples: int, out: str, seed: int,
               ema_decay: float = 0.0, bf16: bool = False,
               adaptive: bool = False, ref_grad_scale: bool = False,
               gen_upsample: str = "transpose", ttur_g_lr: float = 0.0,
               d_steps: int = 1) -> None:
    """``ema_decay > 0`` additionally maintains the in-step generator-weight
    EMA and samples the evaluation set from the AVERAGED weights — the A/B
    measuring what the EMA feature buys in final sample quality (same seed,
    same training trajectory; only the sampled weights differ). Outputs land
    as ``ours_ema_*`` so both arms of a seed can coexist.

    ``bf16`` trains the SAME config with ``compute_dtype=bfloat16`` — the
    dtype every bench.py throughput number uses (round-3 VERDICT missing #2:
    the perf program and the quality program were never the same program;
    the WGAN-GP grad-of-grad is exactly where bf16 numerics could bite).
    Outputs land as ``ours_bf16_*`` so the arm pairs against the f32 golden
    of the same seed.

    ``adaptive`` replaces the open-loop schedule with the CLOSED-loop
    AdaptiveBlurController (the reference's log-only controller,
    /root/reference/callbacks.py:65-135, with assignment enabled) at the
    same σ₀ — the A/B measuring whether the framework's one novel control
    feature helps quality at equal examples (round-3 VERDICT missing #3).
    Outputs land as ``ours_adaptive_*``; meta records the σ trajectory
    endpoint and examples actually trained (the controller may stop early).
    """
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN,
                                       Trainer, TrainerConfig)

    arms = [bool(bf16), bool(ema_decay), bool(adaptive),
            bool(ref_grad_scale), gen_upsample != "transpose",
            bool(ttur_g_lr), d_steps != 1]
    if sum(arms) > 1:
        raise SystemExit("pick one arm per run: --bf16 | --ema_decay | "
                         "--adaptive | --ref_grad_scale | --gen_upsample | "
                         "--ttur_g_lr | --d_steps "
                         "(arms pair 1:1 against the plain run)")
    gen, disc = _our_models(
        cfg, compute_dtype=jnp.bfloat16 if bf16 else None,
        upsample=gen_upsample)
    gan = GAN(gen, disc, blurred=True)
    hp = BlurredWGANGPHyperParameters(batch_size=BATCH,
                                      global_batch_size=BATCH,
                                      ema_decay=ema_decay,
                                      reference_grad_scale=ref_grad_scale,
                                      g_learning_rate=ttur_g_lr,
                                      d_steps_per_g_step=d_steps)
    ds = _corpus(cfg)
    if adaptive:
        from blurred_gan_tpu.sched.blur import AdaptiveBlurController

        open_ctrl = None
        ada_ctrl = AdaptiveBlurController(max_value=cfg.sigma0,
                                          apply_changes=True)
        prefix = "ours_adaptive"
    else:
        open_ctrl = _sigma_controller(cfg, examples)
        ada_ctrl = None
        prefix = ("ours_bf16" if bf16 else
                  "ours_ema" if ema_decay else
                  "ours_refscale" if ref_grad_scale else
                  "ours_resize" if gen_upsample != "transpose" else
                  "ours_ttur" if ttur_g_lr else
                  f"ours_d{d_steps}" if d_steps != 1 else
                  "ours")
    run_dir = os.path.join(out, f"{prefix}_log_s{seed}")
    tr = Trainer(gan, hp, ds,
                 trainer_config=TrainerConfig(
                     log_dir=run_dir, seed=seed,
                     sample_grid_every_n_examples=0,
                     checkpoint_every_n_examples=0,
                     image_summaries_interval_batches=0,
                     # A relay wedge mid-run must fail the seed loudly (the
                     # harness reruns it) instead of hanging the pipeline
                     # (observed: a wedged seed stalled the whole sweep).
                     # Remote backends only: a local CPU step at 128² can
                     # legitimately exceed any sane per-step deadline.
                     device_fetch_timeout_s=(
                         0.0 if jax.default_backend() == "cpu" else 120.0)),
                 blur_controller=open_ctrl,
                 adaptive_controller=ada_ctrl)
    t0 = time.time()
    state = tr.fit(total_examples=examples)
    elapsed = time.time() - t0

    latents = jnp.asarray(_eval_latents())
    g_weights = state.g_ema if ema_decay else state.g_params
    samples = np.concatenate(
        [np.asarray(gan.generate(g_weights, state.g_stats,
                                 latents[i:i + 100], train=False)[0],
                    dtype=np.float32)
         for i in range(0, N_EVAL, 100)])
    tr.close()
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, f"{prefix}_samples_s{seed}.npz"),
             samples=samples)
    meta = {"framework": "blurred_gan_tpu", "config": cfg.name, "seed": seed,
            "examples": examples, "backend": jax.default_backend(),
            "ema_decay": ema_decay, "compute_dtype":
                "bfloat16" if bf16 else "float32",
            "images_per_sec": round(examples / elapsed, 2),
            "elapsed_s": round(elapsed, 1)}
    # Arm hyperparameters, so every meta sidecar states the exact arm surface
    # (a round-4 ttur meta was indistinguishable from the plain run's).
    if ref_grad_scale:
        meta["reference_grad_scale"] = True
    if gen_upsample != "transpose":
        meta["gen_upsample"] = gen_upsample
    if ttur_g_lr:
        meta["ttur_g_lr"] = ttur_g_lr
    if d_steps != 1:
        meta["d_steps_per_g_step"] = d_steps
    if adaptive:
        from blurred_gan_tpu.train.state import wide_value as _wide_value

        meta.update(
            sigma_final=round(float(tr.ada_state.std), 5),
            examples_trained=_wide_value(state.n_img),
            stopped_early=bool(tr.ada_state.stop_training))
    with open(os.path.join(out, f"{prefix}_meta_s{seed}.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


def _is_quality_metric(key: str) -> bool:
    # The north-star metrics (lower = better): SWD levels/avg, both FIDs, KID
    # point estimate (kid_std is an error bar, not a score; PRDC components
    # are higher-better diagnostics — both excluded from gap/pool math).
    return key == "kid" or key.lower().startswith(("swd", "fid"))


def _pooled_stats(rows: dict, seeds, side_a: str, side_b: str) -> dict | None:
    """Pooled A-vs-B statistics over every seed where both sides scored:
    per-metric medians/means with relative gaps (positive = B worse, the
    BASELINE.md convention for 'ours vs ref'), and per-seed win counts.
    This is the reproducible form of the hand-built 'Pooled over all N
    paired seeds' tables (round-3 VERDICT next #4's accept/reject input)."""
    paired = [s for s in seeds
              if f"{side_a}_s{s}" in rows and f"{side_b}_s{s}" in rows]
    if len(paired) < 2:
        return None
    metrics = [k for k in rows[f"{side_a}_s{paired[0]}"]
               if _is_quality_metric(k)]
    pooled, wins = {}, {side_a: 0, side_b: 0, "ties": 0}
    for m in metrics:
        a = np.array([rows[f"{side_a}_s{s}"][m] for s in paired], float)
        b = np.array([rows[f"{side_b}_s{s}"][m] for s in paired], float)
        med_a, med_b = float(np.median(a)), float(np.median(b))
        # Exact ties (common for rounded SWD levels and quantization-identical
        # arms) are tracked explicitly so win totals are self-describing and
        # always sum to n_paired_seeds per metric (round-4 ADVICE).
        w_a, w_b = int(np.sum(b > a)), int(np.sum(a > b))
        ties = len(paired) - w_a - w_b
        wins[side_a] += w_a
        wins[side_b] += w_b
        wins["ties"] += ties
        pooled[m] = {
            f"median_{side_a}": round(med_a, 4),
            f"median_{side_b}": round(med_b, 4),
            "rel_gap_median": (round((med_b - med_a) / abs(med_a), 4)
                               if med_a else None),
            f"mean_{side_a}": round(float(a.mean()), 4),
            f"mean_{side_b}": round(float(b.mean()), 4),
            "rel_gap_mean": (round(float(b.mean() - a.mean())
                                   / abs(float(a.mean())), 4)
                             if a.mean() else None),
            "wins": (f"{side_a} {w_a} / {side_b} {w_b}"
                     + (f" / tie {ties}" if ties else "")),
        }
    return {"pooled": f"{side_b}_vs_{side_a}", "n_paired_seeds": len(paired),
            "seeds": paired, "stats": pooled,
            "total_wins_of_all_comparisons": wins}


def _merge_recorded_rows(rows: dict, paths) -> None:
    """Merge rows from earlier ``evaluate`` JSONL outputs for sample sets
    absent on disk (e.g. the tracked ``results/quality/**/eval_*.jsonl``
    reference rows whose ~50 MB npz sets were never committed): fresh
    same-platform scores always win — only missing ``<side>_s<seed>`` keys
    are filled — so pooled stats can pair new experiment arms against the
    recorded reference rows. Cross-platform mixing is sound to ~0.1-0.3%
    (BASELINE.md round-2/3 re-scores)."""
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                name = row.get("samples", "")
                if ("_s" in name and name not in rows
                        and name != "reals_vs_reals"):
                    rows[name] = row
                    print(json.dumps({"merged_recorded_row": name,
                                      "from": path}), flush=True)


def evaluate(cfg: ParityConfig, out: str, seeds, use_inception: bool,
             inception_size: int = 75, pool: bool = False,
             rows_from=()) -> None:
    sys.path.insert(0, REPO)
    from blurred_gan_tpu.metrics import FIDMetric, SWDMetric

    ds = _corpus(cfg)
    # Held-out-order reals: last N_EVAL of a fixed shuffle (training streams
    # start from the epoch-0 front of per-seed shuffles).
    order = np.random.RandomState(10_000).permutation(ds.num_examples)
    reals = ds.images[order[-N_EVAL:]].astype(np.float32) / 127.5 - 1.0
    reals_b = ds.images[order[:N_EVAL]].astype(np.float32) / 127.5 - 1.0

    feature_fns = {"fid_randconv": None}
    if use_inception:
        from blurred_gan_tpu.metrics import inception_feature_fn

        feature_fns["fid_inception"] = inception_feature_fn(
            resize_to=inception_size)

    def score(name: str, fakes: np.ndarray) -> dict:
        row = {"samples": name}
        swd = SWDMetric()
        for i in range(0, N_EVAL, 100):
            swd.update_state(reals[i:i + 100], fakes[i:i + 100])
        row.update({k: round(float(v), 3) for k, v in swd.results().items()})
        for fid_name, fn in feature_fns.items():
            fid = FIDMetric(feature_fn=fn)
            for i in range(0, N_EVAL, 100):
                fid.update_state(reals[i:i + 100], fakes[i:i + 100])
            row[fid_name] = round(float(fid.result()), 3)
        # Fidelity/diversity split (Naeem et al. 2020) on the random-conv
        # features: shows WHERE a framework's FID gap comes from (precision
        # = fakes on the real manifold; recall/coverage = manifold covered).
        from blurred_gan_tpu.metrics import prdc_from_images

        row.update({k: round(v, 4) for k, v in
                    prdc_from_images(reals, fakes, k=5, batch=100).items()})
        # KID (unbiased MMD², Bińkowski et al. 2018): expectation independent
        # of sample count, so it complements FID's O(n⁻¹) bias at the 1k
        # protocol — the right statistic for the high-per-seed-scatter
        # CelebA regimes (BASELINE.md). Random-conv features; 100 subsets
        # of 500 (of the 1k available) so kid_std is a real error bar.
        from blurred_gan_tpu.metrics import kid_from_images

        row.update({k: round(v, 5) for k, v in
                    kid_from_images(reals, fakes, subset_size=500).items()})
        print(json.dumps(row), flush=True)
        return row

    rows = {"reals_floor": score("reals_vs_reals", reals_b)}
    for seed in seeds:
        for side in ("ref", "ours", "ours_ema", "ours_bf16",
                     "ours_adaptive", "ours_refscale", "ours_resize",
                     "ours_ttur", "ours_d2"):
            path = os.path.join(out, f"{side}_samples_s{seed}.npz")
            if not os.path.exists(path):
                if side in ("ref", "ours"):  # the other arms are optional
                    print(f"[skip] {path} missing", flush=True)
                continue
            with np.load(path) as d:
                rows[f"{side}_s{seed}"] = score(f"{side}_s{seed}",
                                                d["samples"])
    if rows_from:
        _merge_recorded_rows(rows, rows_from)
    # Relative gaps per seed (the 5% north-star, BASELINE.json).
    for seed in seeds:
        r, o = rows.get(f"ref_s{seed}"), rows.get(f"ours_s{seed}")
        if r and o:
            gaps = {}
            for k in r:
                if not _is_quality_metric(k):
                    continue
                if r[k] == 0:  # rounded-to-zero reference: gap undefined
                    gaps[k] = f"ref=0 (ours abs {o[k]})"
                else:
                    gaps[k] = round((o[k] - r[k]) / abs(r[k]), 4)
            print(json.dumps({"rel_gap_ours_vs_ref": gaps, "seed": seed}),
                  flush=True)
    # Feature-arm gaps vs the plain f32 open-loop arm of the same seed
    # (negative = the arm better): EMA weights, bf16 compute, adaptive σ.
    for arm, label in (("ours_ema", "rel_gap_ema_vs_live"),
                       ("ours_bf16", "rel_gap_bf16_vs_f32"),
                       ("ours_adaptive", "rel_gap_adaptive_vs_openloop"),
                       ("ours_refscale", "rel_gap_refscale_vs_default"),
                       ("ours_resize", "rel_gap_resize_vs_transpose"),
                       ("ours_ttur", "rel_gap_ttur_vs_sharedlr"),
                       ("ours_d2", "rel_gap_d2_vs_d1")):
        for seed in seeds:
            o, e = rows.get(f"ours_s{seed}"), rows.get(f"{arm}_s{seed}")
            if o and e:
                gaps = {k: round((e[k] - o[k]) / abs(o[k]), 4)
                        for k in o if _is_quality_metric(k) and o[k] != 0}
                print(json.dumps({label: gaps, "seed": seed}), flush=True)
    if pool:
        for a, b in (("ref", "ours"), ("ours", "ours_ema"),
                     ("ours", "ours_bf16"), ("ours", "ours_adaptive"),
                     ("ref", "ours_adaptive"), ("ours", "ours_refscale"),
                     ("ours", "ours_resize"), ("ref", "ours_resize"),
                     ("ref", "ours_refscale"), ("ref", "ours_ema"),
                     ("ours", "ours_ttur"), ("ref", "ours_ttur"),
                     ("ours", "ours_d2"), ("ref", "ours_d2")):
            stats = _pooled_stats(rows, seeds, a, b)
            if stats:
                print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["train_ref", "train_ours", "evaluate"])
    p.add_argument("--config", default="mnist", choices=sorted(CONFIGS))
    p.add_argument("--examples", type=int, default=60_000)
    p.add_argument("--out", type=str, default="/tmp/quality_parity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", type=str, default="0")
    p.add_argument("--inception", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="train_ours: maintain the generator-weight EMA and "
                        "sample the eval set from the averaged weights "
                        "(outputs named ours_ema_*; evaluate scores them "
                        "when present)")
    p.add_argument("--bf16", action="store_true",
                   help="train_ours: compute_dtype=bfloat16 — the dtype of "
                        "every bench.py throughput number (outputs named "
                        "ours_bf16_*; pairs against the f32 run of the "
                        "same seed)")
    p.add_argument("--adaptive", action="store_true",
                   help="train_ours: closed-loop AdaptiveBlurController at "
                        "the same sigma0 instead of the open-loop schedule "
                        "(outputs named ours_adaptive_*)")
    p.add_argument("--ref_grad_scale", action="store_true",
                   help="train_ours: reference_grad_scale=True — reproduce "
                        "the reference's accidental ×B critic gradient "
                        "(wgan.py:282-284), the one deliberate semantic "
                        "divergence of this framework's default step "
                        "(outputs named ours_refscale_*)")
    p.add_argument("--gen_upsample", default="transpose",
                   choices=["transpose", "resize"],
                   help="train_ours: generator upsampling operator — "
                        "'resize' swaps ConvTranspose for "
                        "nearest-2x + Conv (Odena et al. resize-convolution,"
                        " flat artifact prior; outputs named ours_resize_*)")
    p.add_argument("--pool", action="store_true",
                   help="evaluate: after per-seed rows, print pooled "
                        "median/mean/wins statistics over all paired seeds "
                        "(the BASELINE.md pooled-table numbers, "
                        "reproducibly)")
    p.add_argument("--ttur_g_lr", type=float, default=0.0,
                   help="train_ours: TTUR — a separate generator learning "
                        "rate (the critic keeps --learning_rate's default "
                        "1e-3; the reference shares one lr, wgan.py:39-43). "
                        "Outputs named ours_ttur_*")
    p.add_argument("--d_steps", type=int, default=1,
                   help="train_ours: d_steps_per_g_step — e.g. 2 trains the "
                        "critic twice per generator step (outputs named "
                        "ours_d<N>_*)")
    p.add_argument("--rows_from", type=str, default="",
                   help="evaluate: comma-separated JSONL files from earlier "
                        "evaluate runs; rows for sample sets absent on disk "
                        "are merged in (fresh scores win), so pooled stats "
                        "can pair new arms against recorded reference rows")
    p.add_argument("--inception_size", type=int, default=75,
                   help="Inception input resize for scoring; 75 is the fast "
                        "default used throughout BASELINE.md (a deviation "
                        "from the reference's 299 FID protocol — same trunk "
                        "both sides, so relative gaps are unaffected; pass "
                        "299 for the full protocol)")
    args = p.parse_args()
    cfg = CONFIGS[args.config]
    if args.cmd == "train_ref":
        train_ref(cfg, args.examples, args.out, args.seed)
    elif args.cmd == "train_ours":
        train_ours(cfg, args.examples, args.out, args.seed,
                   ema_decay=args.ema_decay, bf16=args.bf16,
                   adaptive=args.adaptive,
                   ref_grad_scale=args.ref_grad_scale,
                   gen_upsample=args.gen_upsample,
                   ttur_g_lr=args.ttur_g_lr, d_steps=args.d_steps)
    else:
        evaluate(cfg, args.out, [int(s) for s in args.seeds.split(",")],
                 args.inception, args.inception_size, pool=args.pool,
                 rows_from=[p for p in args.rows_from.split(",") if p])
