"""Isolate the cached-step loop cost (no logging, no validation)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)

config = TrainConfig.from_yaml_file("/tmp/ci_experiment.yaml")
config.num_iterations = 1
config.summary_writer_log_dir = "/tmp/wall_probe2_logs"
config.save_full_checkpoint = False
trainer = GaussianPointCloudTrainer(config)

cache = trainer._build_device_cache(1)
cam, images_d, qs_d, ts_d, intrs_d = cache
v = images_d.shape[0]
step = trainer._get_cached_step_fn(cam, v)
trainer.key, sub = jax.random.split(trainer.key)
data_state = (jnp.int32(0), jnp.arange(v, dtype=jnp.int32), jnp.int32(v), sub)

out = step(trainer.scene, trainer.opt_state_features,
           trainer.opt_state_positions, trainer.ctrl_state, data_state,
           images_d, qs_d, ts_d, intrs_d)
jax.block_until_ready(out[4]["loss"])
N = 100
t0 = time.perf_counter()
for i in range(N):
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics, densify_inputs, vc, dm, pi,
     data_state, idx) = step(
        trainer.scene, trainer.opt_state_features,
        trainer.opt_state_positions, trainer.ctrl_state, data_state,
        images_d, qs_d, ts_d, intrs_d)
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"cached-step loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# with the flush every 10 (trainer logging pattern)
pend = []
t0 = time.perf_counter()
for i in range(N):
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics, densify_inputs, vc, dm, pi,
     data_state, idx) = step(
        trainer.scene, trainer.opt_state_features,
        trainer.opt_state_positions, trainer.ctrl_state, data_state,
        images_d, qs_d, ts_d, intrs_d)
    pend.append(metrics)
    if (i + 1) % 10 == 0:
        vals = jax.device_get(pend)
        pend.clear()
t1 = time.perf_counter()
print(f"cached-step+flush10: {(t1-t0)/N*1e3:.1f} ms/iter")
