"""Worker script for the real multi-process (multi-host) test.

Launched twice by tests/test_multihost.py with PROC_ID 0/1; each process gets
2 virtual CPU devices, joins a 2-process jax.distributed cluster, builds a
4-device data mesh spanning both processes, and runs a short Trainer fit.
Process 0 prints the final metrics for the parent test to check.
"""

import os
import sys

port = sys.argv[1]
proc_id = int(sys.argv[2])
work_dir = sys.argv[3]
cache_dir = work_dir + "/cache"

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# Fresh shared cache per test run: BOTH processes must compile symmetrically
# (an asymmetric cache hit lets one process reach a collective while the
# other is still minutes into compiling, blowing Gloo's 30s rendezvous).
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

import numpy as np
from jax.sharding import Mesh

from blurred_gan_tpu.data import synthetic_dataset
from blurred_gan_tpu.models import DCGANDiscriminator, DCGANGenerator
from blurred_gan_tpu.sched.blur import BlurDecayController
from blurred_gan_tpu.train import (BlurredWGANGPHyperParameters, GAN, Trainer,
                                   TrainerConfig)

gan = GAN(
    DCGANGenerator(latent_size=16, init_hw=(4, 4), init_features=16,
                   blocks=((16, 2),), out_channels=1,
                   final_transpose=False, final_stride=1),
    DCGANDiscriminator(channels=(8,)), latent_size=16, blurred=True)
hp = BlurredWGANGPHyperParameters(batch_size=2, global_batch_size=8)
mesh = Mesh(np.array(jax.devices()), ("data",))

tr = Trainer(
    gan, hp, synthetic_dataset((8, 8, 1), num_examples=64),
    trainer_config=TrainerConfig(
        log_dir=f"{work_dir}/p{proc_id}",
        checkpoint_every_n_examples=10_000_000,
        sample_grid_every_n_examples=32,  # exercises the multi-host grid path
        image_summaries_interval_batches=0,
        save_sample_pngs=False, seed=0),
    mesh=mesh,
    blur_controller=BlurDecayController(640, max_value=1.0))
state = tr.fit(total_examples=10_000, max_steps=5)
logs = tr._last_metrics
# Multi-host evaluate(): each process pairs ITS reals shard with its local
# fake shard (loop.py evaluate contract); a tiny FID exercises the path.
from blurred_gan_tpu.metrics import FIDMetric

ev = tr.evaluate(num_samples=8, metrics=[FIDMetric(feature_dim=16)])
assert ev["FID"] >= 0.0, ev
tr.close()
if proc_id == 0:
    print(f"MH-RESULT n_batches={int(state.n_batches)} "
          f"disc_loss={logs['disc_loss']:.6f}", flush=True)
print(f"proc{proc_id} done", flush=True)
