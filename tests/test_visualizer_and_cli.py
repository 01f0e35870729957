"""Visualizer state machine + render CLI helpers (headless)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_scene(tmp_path, n=20, seed=0):
    from taichi_3d_gaussian_splatting_tpu.models.scene import (
        GaussianPointCloudScene, SceneConfig)
    rng = np.random.default_rng(seed)
    pc = np.concatenate([rng.uniform(-0.5, 0.5, (n, 2)),
                         rng.uniform(1.5, 3.0, (n, 1))], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = -2.0
    feats[:, 7] = 2.0
    feats[:, 8] = 2.0
    scene = GaussianPointCloudScene.from_arrays(pc, SceneConfig(),
                                                point_cloud_features=feats)
    path = str(tmp_path / f"scene_{seed}.parquet")
    scene.to_parquet(path)
    return path


def test_merge_scenes_assigns_object_ids(tmp_path):
    from gaussian_point_render import merge_scenes
    p1 = _write_scene(tmp_path, seed=0)
    p2 = _write_scene(tmp_path, seed=1)
    pc, feats, invalid, obj, k = merge_scenes([p1, p2])
    assert k == 2
    obj_np = np.asarray(obj)
    assert (obj_np[:20] == 0).all() and (obj_np[20:] == 1).all()
    assert pc.shape[0] == 40


def test_visualizer_state_controls(tmp_path):
    from visualizer import VisualizerState
    p1 = _write_scene(tmp_path, seed=0)
    p2 = _write_scene(tmp_path, seed=1)
    state = VisualizerState([p1, p2], width=32, height=32, focal=24.0)

    # render an initial frame
    png = state.frame_png()
    assert png[:4] == b"\x89PNG"

    # camera move changes the pose
    t_before = state.ts.copy()
    assert state.handle_key("w").startswith("move")
    assert not np.allclose(state.ts, t_before)

    # select object 1: motion now moves only that object's pose
    assert "object 1" in state.handle_key("1")
    t_before = state.ts.copy()
    state.handle_key("d")
    assert np.allclose(state.ts[0], t_before[0])
    assert not np.allclose(state.ts[1], t_before[1])

    # rotation updates quaternion, stays normalized
    q_before = state.qs.copy()
    state.handle_key("ArrowLeft")
    assert not np.allclose(state.qs[1], q_before[1])
    np.testing.assert_allclose(np.linalg.norm(state.qs, axis=1), 1.0,
                               atol=1e-5)

    # hide/show toggles rendering of the selected object
    assert "hidden" in state.handle_key("h")
    png_hidden = state.frame_png()
    assert "shown" in state.handle_key("p")

    # reset restores identity poses
    state.handle_key("r")
    assert np.allclose(state.ts, 0)

    # out-of-range object selection is rejected
    assert "no object" in state.handle_key("7")

    # mouse-drag rotates the selected target (object 1 still selected);
    # a pure-x drag yaws like ArrowRight, quaternions stay normalized
    q_before = state.qs.copy()
    msg = state.handle_drag(40.0, 0.0)
    assert "object 1" in msg
    assert np.allclose(state.qs[0], q_before[0])
    assert not np.allclose(state.qs[1], q_before[1])
    np.testing.assert_allclose(np.linalg.norm(state.qs, axis=1), 1.0,
                               atol=1e-5)
    # back to camera: drag moves every object pose (camera = all targets)
    state.handle_key("`")
    q_before = state.qs.copy()
    assert "camera" in state.handle_drag(0.0, -25.0)
    assert not np.allclose(state.qs, q_before)


def test_render_cli_pose_loading(tmp_path):
    import gaussian_point_render as gpr
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    path = str(tmp_path / "poses.npy")
    np.save(path, poses)
    cfg = gpr.RenderConfig(parquet_path_list=[], trajectory_path=path)
    loaded, intr = gpr.load_poses(cfg)
    assert loaded.shape == (3, 4, 4)
    assert intr is None
