"""Subprocess runner for the compiled-TPU vs CPU-interpret exactness gate.

Invoked by tests/test_tpu_exactness.py as
`python tests/ab_runner.py {cpu|tpu} out.npz`. Renders two fixed scenes
through the full rasterizer + hand-written VJP and dumps every output the
test compares. Must run in a fresh process per backend: the jax platform
cannot be switched after initialization.
"""

import os
import sys

mode, out_path = sys.argv[1], sys.argv[2]
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if mode == "cpu":
    # the axon plugin overrides the env var; the config flag wins (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (  # noqa: E402
    RasterizerConfig, rasterize_with_vjp)


def make_camera(w=32, h=32, f=25.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return CameraInfo(camera_intrinsics=K, camera_height=h, camera_width=w)


def random_scene(n, seed=0, alpha=2.0):
    rng = np.random.default_rng(seed)
    # depths on a ladder centered between quantization buckets (see the cfg
    # comment in main): every pairwise gap is 5 buckets and every value sits
    # 0.5 buckets from an edge, so f32 noise (~1e-6) can neither flip a
    # bucket nor reorder two points across backends
    z = 1.005 + 0.05 * rng.permutation(n).astype(np.float32)
    pc = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                         z[:, None]], axis=1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.0, (n, 3))
    feats[:, 7] = alpha + rng.normal(size=n)
    feats[:, 8:56] = 0.3 * rng.normal(size=(n, 48))
    feats[:, 8] += 1.0
    return pc, feats


def main():
    # The fixture guarantees a backend-independent blend order: the blend
    # order of exactly-tied quantized-depth keys is backend-dependent
    # (unstable sort, as in the reference's torch.sort, reference:
    # GaussianPointCloudRasterisation.py:947) and alpha blending is not
    # commutative, so tied or bucket-edge depths would make this a
    # tie-order test instead of a numerics test. Depths are laid on a
    # bucket-centered ladder (see random_scene) and asserted below.
    # pools sized so NOTHING can drop (divisor 1 -> every point fits):
    # when a pool overflows, WHICH candidates drop is an unstable-sort
    # artifact that legitimately differs across backends (counted, never
    # silent) - an overflowing fixture would compare arbitrary subsets.
    cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0, max_keys=2048,
                           max_tiles_per_point=16,
                           mid_point_divisor=1, big_point_divisor=1,
                           depth_to_sort_key_scale=100.0)
    cam = make_camera()
    out = {}
    # explicit pool-ladder layout (the auto_capacity path): same numerics
    # contract through the generalized tier emission
    cfg_ladder = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                                  max_keys=2048, pool_slots=(4, 8, 16),
                                  pool_caps=(60, 60, 60),
                                  depth_to_sort_key_scale=100.0)
    # scene "b" uses a high alpha so transmittance saturation actually
    # triggers - the saturation latch semantics must agree bit-for-bit-ish;
    # scene "c" re-renders "a" through the ladder layout
    for seed, alpha, label, cfg in [(1, 2.0, "a", cfg), (2, 7.0, "b", cfg),
                                    (1, 2.0, "c", cfg_ladder)]:
        pc, feats = random_scene(60, seed=seed, alpha=alpha)
        n = pc.shape[0]
        # identity camera at origin -> camera depth == z; no two points may
        # share a quantized sort bucket, and no value may sit near a bucket
        # edge (see cfg comment)
        scaled = pc[:, 2] * cfg.depth_to_sort_key_scale
        depth_q = np.floor(scaled)
        assert len(np.unique(depth_q)) == n, "tied depth buckets in fixture"
        frac = scaled - depth_q
        assert ((frac > 0.2) & (frac < 0.8)).all(), "bucket-edge depth"
        obj = jnp.zeros((n,), jnp.int32)
        inv = jnp.zeros((n,), jnp.int8)
        q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
        t_cam = jnp.zeros((1, 3))
        result, vjp_fn = rasterize_with_vjp(
            jnp.array(pc), jnp.array(feats), inv, obj, q_cam, t_cam, cam, cfg)
        rng = np.random.default_rng(9)
        g_img = jnp.array(rng.normal(size=(32, 32, 3)).astype(np.float32))
        gp, gf, stats = vjp_fn(g_img)
        jax.block_until_ready((result.image, gp, gf))
        assert int(result.aux.big_point_overflow) == 0, "pool overflow"
        assert int(result.aux.key_overflow) == 0, "key overflow"
        out[f"{label}_img"] = np.asarray(result.image)
        out[f"{label}_depth"] = np.asarray(result.depth)
        out[f"{label}_alpha"] = np.asarray(
            result.aux.pixel_accumulated_alpha)
        out[f"{label}_count"] = np.asarray(result.pixel_valid_point_count)
        out[f"{label}_gp"] = np.asarray(gp)
        out[f"{label}_gf"] = np.asarray(gf)
        out[f"{label}_mag"] = np.asarray(stats.magnitude_grad_viewspace)
        out[f"{label}_npix"] = np.asarray(stats.num_affected_pixels)
        out[f"{label}_magimg"] = np.asarray(
            stats.magnitude_grad_viewspace_on_image)
    np.savez(out_path, **out)
    print(f"ab_runner[{mode}]: backend={jax.default_backend()} saved {out_path}")


if __name__ == "__main__":
    main()
