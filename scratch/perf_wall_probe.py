"""Where does trainer wall-clock go? Phase timing of the real train loop.

Reuses the CI experiment dataset (128x128, 48 views). Run on TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)

config = TrainConfig.from_yaml_file("/tmp/ci_experiment.yaml")
config.num_iterations = 1
config.summary_writer_log_dir = "/tmp/wall_probe_logs"
config.save_full_checkpoint = False
trainer = GaussianPointCloudTrainer(config)

from taichi_3d_gaussian_splatting_tpu.data.dataset import PrefetchLoader
loader = PrefetchLoader(trainer.train_dataset, shuffle=True, num_workers=4,
                        seed=0)
it = iter(loader)

t_data = t_step = t_sync = t_asarray = 0.0
FULL = os.environ.get("FULL", "0") == "1"
N = 40
# warm up compile
item = next(it)
step = trainer._get_step_fn(item.camera_info)
args = lambda item: (trainer.scene, trainer.opt_state_features,
                     trainer.opt_state_positions, trainer.ctrl_state,
                     jnp.asarray(item.image),
                     jnp.asarray(item.q_pointcloud_camera),
                     jnp.asarray(item.t_pointcloud_camera),
                     jnp.int32(0),
                     jnp.asarray(item.camera_info.camera_intrinsics,
                                 jnp.float32))
out = step(*args(item))
jax.block_until_ready(out[4]["loss"])

for i in range(N if FULL else 0):
    t0 = time.perf_counter()
    item = next(it)
    t1 = time.perf_counter()
    a = args(item)
    t2 = time.perf_counter()
    out = step(*a)
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
    t3 = time.perf_counter()
    loss = float(metrics["loss"])
    t4 = time.perf_counter()
    t_data += t1 - t0
    t_asarray += t2 - t1
    t_step += t3 - t2
    t_sync += t4 - t3
if FULL:
    print(f"per-iter ms: data={t_data/N*1e3:.1f} asarray={t_asarray/N*1e3:.1f} "
          f"dispatch={t_step/N*1e3:.1f} sync_float={t_sync/N*1e3:.1f} "
          f"total={(t_data+t_asarray+t_step+t_sync)/N*1e3:.1f}")

# no-sync loop: dispatch N steps back-to-back, block once
t0 = time.perf_counter()
for i in range(N if FULL else 0):
    item = next(it)
    out = step(*args(item))
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"no-sync loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# batched flush every 10
t0 = time.perf_counter()
pend = []
for i in range(N if FULL else 0):
    item = next(it)
    out = step(*args(item))
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
    pend.append(metrics)
    if (i + 1) % 10 == 0:
        vals = jax.device_get(pend)
        pend.clear()
t1 = time.perf_counter()
print(f"flush-10 loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# pre-uploaded inputs: no per-iter host->device transfers
fixed = args(item)
fixed = jax.tree.map(jnp.asarray, fixed)
jax.block_until_ready(fixed[4])
t0 = time.perf_counter()
for i in range(N if FULL else 0):
    out = step(*fixed[:4], *fixed[4:])
    fixed = (trainer.scene, trainer.opt_state_features,
             trainer.opt_state_positions, trainer.ctrl_state) + fixed[4:]
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"preloaded loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# lookahead upload: enqueue next item's transfers while the step runs
def upload(item):
    return (jnp.asarray(item.image),
            jnp.asarray(item.q_pointcloud_camera),
            jnp.asarray(item.t_pointcloud_camera),
            jnp.asarray(item.camera_info.camera_intrinsics, jnp.float32))

nxt = upload(next(it))
t0 = time.perf_counter()
for i in range(N):
    cur = nxt
    out = step(trainer.scene, trainer.opt_state_features,
               trainer.opt_state_positions, trainer.ctrl_state,
               cur[0], cur[1], cur[2], jnp.int32(0), cur[3])
    nxt = upload(next(it))
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"lookahead loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# packed single upload per item
def upload_packed(item):
    img = item.image.reshape(-1)
    packed = np.concatenate([
        img, item.q_pointcloud_camera.reshape(-1),
        item.t_pointcloud_camera.reshape(-1),
        np.asarray(item.camera_info.camera_intrinsics,
                   np.float32).reshape(-1)]).astype(np.float32)
    return jnp.asarray(packed), item.image.shape

nxt = upload_packed(next(it))
t0 = time.perf_counter()
for i in range(N):
    packed, shape = nxt
    npix = int(np.prod(shape))
    img = packed[:npix].reshape(shape)
    q = packed[npix:npix + 4].reshape(1, 4)
    t = packed[npix + 4:npix + 7].reshape(1, 3)
    intr = packed[npix + 7:npix + 16].reshape(3, 3)
    out = step(trainer.scene, trainer.opt_state_features,
               trainer.opt_state_positions, trainer.ctrl_state,
               img, q, t, jnp.int32(0), intr)
    nxt = upload_packed(next(it))
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"packed lookahead loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# threaded uploader: a background thread device_puts items ahead of use
import queue
import threading

def uploader(q_out, n_items):
    it2 = iter(loader)
    for _ in range(n_items + 2):
        item = next(it2)
        q_out.put(upload(item))
    q_out.put(None)

q_items = queue.Queue(maxsize=4)
th = threading.Thread(target=uploader, args=(q_items, N), daemon=True)
th.start()
cur = q_items.get()
t0 = time.perf_counter()
for i in range(N):
    out = step(trainer.scene, trainer.opt_state_features,
               trainer.opt_state_positions, trainer.ctrl_state,
               cur[0], cur[1], cur[2], jnp.int32(0), cur[3])
    cur = q_items.get()
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"threaded-upload loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# single packed upload, unpacked INSIDE the jit (free) -> 1 transfer + 1 dispatch
H, W = item.image.shape[:2]
NPIX = H * W * 3

@jax.jit
def step_packed(scene, of, op, ctrl, packed, band):
    img = packed[:NPIX].reshape(H, W, 3)
    q = packed[NPIX:NPIX + 4][None]
    t = packed[NPIX + 4:NPIX + 7][None]
    intr = packed[NPIX + 7:NPIX + 16].reshape(3, 3)
    return step(scene, of, op, ctrl, img, q, t, band, intr)

def pack(item):
    return jnp.asarray(np.concatenate([
        item.image.reshape(-1),
        item.q_pointcloud_camera.reshape(-1),
        item.t_pointcloud_camera.reshape(-1),
        np.asarray(item.camera_info.camera_intrinsics,
                   np.float32).reshape(-1)]).astype(np.float32))

nxt = pack(next(it))
band = jnp.int32(0)
out = step_packed(trainer.scene, trainer.opt_state_features,
                  trainer.opt_state_positions, trainer.ctrl_state, nxt, band)
jax.block_until_ready(out[4]["loss"])
t0 = time.perf_counter()
for i in range(N):
    cur = nxt
    out = step_packed(trainer.scene, trainer.opt_state_features,
                      trainer.opt_state_positions, trainer.ctrl_state,
                      cur, band)
    nxt = pack(next(it))
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"packed-in-jit loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# emulate the cached-trainer fetch: device-stack indexing + band scalar
items_all = [trainer.train_dataset[i] for i in range(len(trainer.train_dataset))]
images_d = jnp.asarray(np.stack([i.image for i in items_all]))
qs_d = jnp.asarray(np.stack([i.q_pointcloud_camera for i in items_all]))
ts_d = jnp.asarray(np.stack([i.t_pointcloud_camera for i in items_all]))
intrs_d = jnp.asarray(np.stack(
    [np.asarray(i.camera_info.camera_intrinsics, np.float32)
     for i in items_all]))
jax.block_until_ready(images_d)
V = images_d.shape[0]

t0 = time.perf_counter()
for i in range(N):
    i0 = i % V
    out = step(trainer.scene, trainer.opt_state_features,
               trainer.opt_state_positions, trainer.ctrl_state,
               images_d[i0], qs_d[i0], ts_d[i0], jnp.int32(i // 100),
               intrs_d[i0])
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"cache-emulation loop: {(t1-t0)/N*1e3:.1f} ms/iter")

# same but dynamic_slice via jnp.take with a DEVICE index + cached band
take = jax.jit(lambda a, i: a[i])
band = jnp.int32(0)
t0 = time.perf_counter()
for i in range(N):
    idx = jnp.int32(i % V)
    out = step(trainer.scene, trainer.opt_state_features,
               trainer.opt_state_positions, trainer.ctrl_state,
               take(images_d, idx), take(qs_d, idx), take(ts_d, idx), band,
               take(intrs_d, idx))
    (trainer.scene, trainer.opt_state_features, trainer.opt_state_positions,
     trainer.ctrl_state, metrics) = out[:5]
jax.block_until_ready(trainer.scene.point_cloud)
t1 = time.perf_counter()
print(f"take-device-idx loop: {(t1-t0)/N*1e3:.1f} ms/iter")
