"""Distributed-without-a-cluster tests (SURVEY.md §4.3) on the 8-device CPU mesh.

Contracts verified:
- the sum(...)/global_batch_size loss scaling (wgan.py:130,157) means the sharded
  step computes exactly the single-device global gradient — so a train step on an
  8-device mesh must produce bit-comparable state to the same step on one device;
- metrics are replicated scalars; fakes come back batch-sharded;
- the driver's dryrun_multichip contract holds.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    create_train_state,
    make_train_step,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def micro_gan(channels=1):
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=32,
                       blocks=((32, 2), (16, 2)), out_channels=channels,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(16, 32))
    return GAN(g, d, latent_size=16, blurred=True)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


class TestShardedStepMatchesSingleDevice:
    def test_one_step_equivalence(self, mesh):
        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=16)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        reals = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 16, 1),
                                   jnp.float32, -1.0, 1.0)
        k = jax.random.PRNGKey(2)

        step_1 = make_train_step(gan, hp, mesh=None, donate_state=False)
        step_8 = make_train_step(gan, hp, mesh=mesh, donate_state=False)

        s1, m1, f1 = step_1(state, reals, jnp.float32(1.0), k)
        s8, m8, f8 = step_8(state, reals, jnp.float32(1.0), k)

        # Metrics agree to float tolerance (reduction order may differ).
        for key in ("disc_loss", "gp_term", "fake_scores", "real_scores"):
            assert float(m1[key]) == pytest.approx(float(m8[key]),
                                                   rel=2e-4, abs=2e-5), key
        # Updated parameters agree.
        l1 = jax.tree_util.tree_leaves(s1.d_params)
        l8 = jax.tree_util.tree_leaves(s8.d_params)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
        # Fakes identical (same latents, generator in eval mode).
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f8),
                                   rtol=1e-5, atol=1e-6)

    def test_multi_step_stays_in_sync(self, mesh):
        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=16)
        gan = micro_gan()
        state1 = create_train_state(gan, hp, jax.random.PRNGKey(0),
                                    (16, 16, 1))
        state8 = state1
        step_1 = make_train_step(gan, hp, mesh=None, donate_state=False)
        step_8 = make_train_step(gan, hp, mesh=mesh, donate_state=False)
        rng = jax.random.PRNGKey(3)
        for i in range(3):
            reals = jax.random.uniform(jax.random.fold_in(rng, 100 + i),
                                       (16, 16, 16, 1), jnp.float32, -1, 1)
            k = jax.random.fold_in(rng, i)
            state1, m1, _ = step_1(state1, reals, jnp.float32(0.8), k)
            state8, m8, _ = step_8(state8, reals, jnp.float32(0.8), k)
        assert float(m1["disc_loss"]) == pytest.approx(
            float(m8["disc_loss"]), rel=1e-3, abs=1e-4)
        assert int(state8.n_batches) == 3

    def test_output_shardings(self, mesh):
        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=16)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        step_8 = make_train_step(gan, hp, mesh=mesh, donate_state=False)
        reals = jnp.zeros((16, 16, 16, 1), jnp.float32)
        s8, m8, f8 = step_8(state, reals, jnp.float32(1.0),
                            jax.random.PRNGKey(1))
        # fakes sharded over data axis; state replicated.
        assert f8.sharding.spec == P("data")
        d_leaf = jax.tree_util.tree_leaves(s8.d_params)[0]
        assert d_leaf.sharding.is_fully_replicated


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_dryrun_self_provisions_in_subprocess(self, capsys):
        """The driver calls dryrun_multichip with NO env setup (1 real chip,
        no XLA_FLAGS) — the function must provision its own virtual CPU mesh
        via subprocess re-exec and propagate the OK line (VERDICT r1 #1)."""
        import __graft_entry__ as g

        g._dryrun_in_subprocess(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip(8) OK on mesh (data=4, model=2)" in out

    def test_dryrun_subprocess_recursion_guard(self, monkeypatch):
        """If the subprocess still lacks devices, fail loudly instead of
        forking forever."""
        import __graft_entry__ as g

        monkeypatch.setenv(g._SUBPROCESS_MARKER, "1")
        with pytest.raises(RuntimeError, match="provisioning failed"):
            g.dryrun_multichip(16)  # > the 8 virtual devices we have

    def test_entry_signature(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        assert callable(fn) and isinstance(args, tuple)
        # jittable and traceable (abstract eval only — no full CelebA-128
        # compile on CPU).
        jax.eval_shape(fn, *args)


class TestTrainerWithMesh:
    def test_fit_and_resume_under_mesh(self, mesh, tmp_path):
        from blurred_gan_tpu.data import synthetic_dataset
        from blurred_gan_tpu.sched.blur import BlurDecayController
        from blurred_gan_tpu.train import Trainer, TrainerConfig

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=16)
        ds = synthetic_dataset((16, 16, 1), num_examples=64)

        def mk():
            return Trainer(
                micro_gan(), hp, ds,
                trainer_config=TrainerConfig(
                    log_dir=str(tmp_path / "mesh_run"),
                    checkpoint_every_n_examples=100_000,
                    sample_grid_every_n_examples=100_000,
                    image_summaries_interval_batches=0,
                    save_sample_pngs=False, seed=0),
                mesh=mesh,
                blur_controller=BlurDecayController(640, max_value=1.0))

        tr = mk()
        state = tr.fit(total_examples=10_000, max_steps=4)
        assert int(state.n_batches) == 4
        assert np.isfinite(tr._last_metrics["disc_loss"])
        tr.close()

        tr2 = mk()  # auto-restores the end-of-fit checkpoint
        assert int(tr2.state.n_batches) == 4
        state2 = tr2.fit(total_examples=10_000, max_steps=2)
        assert int(state2.n_batches) == 6
        tr2.close()


class TestTensorParallel:
    def test_dp_tp_step_matches_single_device(self):
        """4x2 (data, model) mesh step == single-device step: GSPMD parameter
        sharding must not change the math."""
        from blurred_gan_tpu.parallel import make_mesh, state_shardings

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=8)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        mesh2d = make_mesh(4, 2)
        sh = state_shardings(state, mesh2d)
        # Sanity: at least one conv kernel actually got model-sharded.
        specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
        assert any("model" in str(s) for s in specs)

        step_1 = make_train_step(gan, hp, mesh=None, donate_state=False)
        step_tp = make_train_step(gan, hp, mesh=mesh2d, donate_state=False,
                                  state_shardings=sh)
        reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                                   jnp.float32, -1.0, 1.0)
        k = jax.random.PRNGKey(2)
        s1, m1, f1 = step_1(state, reals, jnp.float32(1.0), k)
        s2, m2, f2 = step_tp(state, reals, jnp.float32(1.0), k)
        for key in ("disc_loss", "gp_term", "fake_scores", "real_scores"):
            assert float(m1[key]) == pytest.approx(float(m2[key]),
                                                   rel=3e-4, abs=3e-5), key
        for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                        jax.tree_util.tree_leaves(s2.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-5)

    def test_dryrun_uses_2d_mesh(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "(data=4, model=2)" in out


class TestFSDP:
    def test_fsdp_step_matches_single_device(self):
        """DP×TP×FSDP: parameters (and, by shape-mirroring, optimizer
        moments) sharded over the data axis must not change the math —
        GSPMD all-gathers the weights per layer."""
        from blurred_gan_tpu.parallel import make_mesh, state_shardings

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=8)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        mesh2d = make_mesh(4, 2)
        sh = state_shardings(state, mesh2d, fsdp=True, fsdp_min_size=2 ** 10)
        specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
        # Both axes actually in use: some leaf data-sharded (FSDP), some
        # model-sharded (TP).
        assert any("data" in str(s) for s in specs)
        assert any("model" in str(s) for s in specs)

        step_1 = make_train_step(gan, hp, mesh=None, donate_state=False)
        step_f = make_train_step(gan, hp, mesh=mesh2d, donate_state=False,
                                 state_shardings=sh)
        reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                                   jnp.float32, -1.0, 1.0)
        k = jax.random.PRNGKey(2)
        s1, m1, f1 = step_1(state, reals, jnp.float32(1.0), k)
        s2, m2, f2 = step_f(state, reals, jnp.float32(1.0), k)
        for key in ("disc_loss", "gp_term", "fake_scores", "real_scores"):
            assert float(m1[key]) == pytest.approx(float(m2[key]),
                                                   rel=3e-4, abs=3e-5), key
        for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                        jax.tree_util.tree_leaves(s2.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-5)
        # The updated state keeps the FSDP layout (each data shard owns its
        # parameter slice — the per-device memory win persists across steps).
        sharded = [l for l in jax.tree_util.tree_leaves(s2.d_params)
                   if "data" in str(l.sharding.spec)]
        assert sharded, "no post-step d_params leaf kept its data sharding"

    def test_small_leaves_stay_replicated(self):
        from blurred_gan_tpu.parallel import make_mesh, state_shardings

        hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=8)
        gan = micro_gan()
        state = create_train_state(gan, hp, jax.random.PRNGKey(0), (16, 16, 1))
        mesh2d = make_mesh(4, 2)
        # Default threshold (2**14): the micro GAN's biggest kernel is
        # 5*5*32*32 = 25,600 elems (sharded); everything under 16,384
        # elements replicates.
        sh = state_shardings(state, mesh2d, fsdp=True)
        for leaf, s in zip(jax.tree_util.tree_leaves(state),
                           jax.tree_util.tree_leaves(sh)):
            size = int(np.prod(getattr(leaf, "shape", ()) or (1,)))
            if size < 2 ** 14:
                assert "data" not in str(s.spec), (leaf.shape, s.spec)
