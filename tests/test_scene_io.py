"""Scene I/O: parquet/PLY round-trips, initialization, config YAML parsing."""

import os

import numpy as np
import pytest

from taichi_3d_gaussian_splatting_tpu.models.scene import (
    GaussianPointCloudScene, SceneConfig, FEATURE_COLUMNS)
from taichi_3d_gaussian_splatting_tpu import config as cfg_mod


def random_scene_arrays(n=50, seed=0):
    rng = np.random.default_rng(seed)
    pc = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 56)).astype(np.float32)
    return pc, feats


def test_parquet_roundtrip(tmp_path):
    pc, feats = random_scene_arrays()
    scene = GaussianPointCloudScene.from_arrays(pc, SceneConfig(),
                                                point_cloud_features=feats)
    path = os.path.join(tmp_path, "scene.parquet")
    scene.to_parquet(path)
    scene2 = GaussianPointCloudScene.from_parquet(path)
    np.testing.assert_allclose(np.asarray(scene2.point_cloud), pc, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene2.point_cloud_features), feats,
                               atol=1e-6)


def test_parquet_initialize_from_xyz_only(tmp_path):
    import pandas as pd
    rng = np.random.default_rng(1)
    pc = rng.normal(size=(40, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "pc.parquet")
    pd.DataFrame(pc, columns=["x", "y", "z"]).to_parquet(path)
    scene = GaussianPointCloudScene.from_parquet(
        path, SceneConfig(initial_alpha=-1.5))
    feats = np.asarray(scene.point_cloud_features)
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(feats[:, 0:4], axis=1), 1.0,
                               atol=1e-5)
    # alpha from config, DC = 1.0, higher SH zero
    assert (feats[:, 7] == -1.5).all()
    assert (feats[:, 8] == 1.0).all() and (feats[:, 24] == 1.0).all()
    assert (feats[:, 9:24] == 0).all()
    # log-covariance is finite and reflects NN distances
    assert np.isfinite(feats[:, 4:7]).all()


def test_parquet_color_init(tmp_path):
    import pandas as pd
    rng = np.random.default_rng(2)
    pc = rng.normal(size=(30, 3)).astype(np.float32)
    rgb = rng.integers(10, 240, size=(30, 3)).astype(np.float64)
    df = pd.DataFrame(np.concatenate([pc, rgb], axis=1),
                      columns=["x", "y", "z", "r", "g", "b"])
    path = os.path.join(tmp_path, "pc_rgb.parquet")
    df.to_parquet(path)
    scene = GaussianPointCloudScene.from_parquet(path)
    feats = np.asarray(scene.point_cloud_features)
    c0 = 0.28209479177387814
    want = np.log((rgb[:, 0] / 255.0) / (1 - rgb[:, 0] / 255.0)) / c0
    np.testing.assert_allclose(feats[:, 8], want, rtol=1e-4)


def test_fixed_capacity_padding():
    pc, feats = random_scene_arrays(n=20)
    scene = GaussianPointCloudScene.from_arrays(
        pc, SceneConfig(max_num_points_ratio=3.0),
        point_cloud_features=feats)
    assert scene.capacity == 60
    inv = np.asarray(scene.point_invalid_mask)
    assert inv[:20].sum() == 0 and inv[20:].sum() == 40
    assert scene.num_valid_points() == 20


def test_ply_roundtrip(tmp_path):
    pc, feats = random_scene_arrays(n=25, seed=3)
    scene = GaussianPointCloudScene.from_arrays(pc, SceneConfig(),
                                                point_cloud_features=feats)
    path = os.path.join(tmp_path, "scene.ply")
    scene.to_ply(path)
    scene2 = GaussianPointCloudScene.from_ply(path)
    np.testing.assert_allclose(np.asarray(scene2.point_cloud), pc, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene2.point_cloud_features), feats,
                               atol=1e-6)


def test_add_sphere(tmp_path):
    import pandas as pd
    rng = np.random.default_rng(4)
    pc = rng.normal(size=(30, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "pc.parquet")
    pd.DataFrame(pc, columns=["x", "y", "z"]).to_parquet(path)
    scene = GaussianPointCloudScene.from_parquet(
        path, SceneConfig(add_sphere=True, num_points_sphere=100,
                          sphere_radius_factor=4.0))
    assert scene.capacity == 130


def test_config_yaml_kebab_and_unknown_keys(tmp_path):
    import dataclasses

    @dataclasses.dataclass
    class Inner:
        near_plane: float = 0.8
        far_plane: float = 1000.0

    @dataclasses.dataclass
    class Outer:
        num_iterations: int = 300000
        feature_learning_rate: float = 1e-3
        inner: Inner = dataclasses.field(default_factory=Inner)

    yaml_text = """
num-iterations: 30001
feature_learning_rate: 0.005
position_learning_rateo: 0.00005  # typo key, tolerated like the reference
inner:
  near-plane: 0.4
  far_plane: 2000.0
"""
    path = os.path.join(tmp_path, "c.yaml")
    with open(path, "w") as f:
        f.write(yaml_text)
    out = cfg_mod.from_yaml_file(Outer, path)
    assert out.num_iterations == 30001
    assert out.feature_learning_rate == 0.005
    assert out.inner.near_plane == 0.4
    assert out.inner.far_plane == 2000.0


def test_config_reference_yaml_loads():
    """The real reference YAML (with typo keys, kebab case, string floats)
    must parse into our TrainConfig."""
    from taichi_3d_gaussian_splatting_tpu.training.trainer import TrainConfig
    path = "/root/reference/config/tat_truck_every_8_test.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    cfg = cfg_mod.from_yaml_file(TrainConfig, path)
    assert cfg.num_iterations == 30001
    assert cfg.feature_learning_rate == 0.005
    assert cfg.rasterisation_config.near_plane == 0.4
    assert cfg.rasterisation_config.far_plane == 2000.0
    assert cfg.adaptive_controller_config.num_iterations_warm_up == 1000
    assert cfg.gaussian_point_cloud_scene_config.max_num_points_ratio == 10.0
    assert cfg.loss_function_config.lambda_value == 0.2


def test_every_reference_config_yaml_loads():
    """ALL of the reference's ready-made YAMLs must load, including
    config_template.yaml's `!!python/tuple` tag (the reference's
    dataclass_wizard emits it for a tuple-typed default)."""
    import glob
    from taichi_3d_gaussian_splatting_tpu.training.trainer import TrainConfig
    paths = sorted(glob.glob("/root/reference/config/*.yaml"))
    if not paths:
        pytest.skip("reference configs not mounted")
    assert len(paths) == 12
    for path in paths:
        cfg = cfg_mod.from_yaml_file(TrainConfig, path)
        assert cfg.num_iterations > 0, path
        assert cfg.rasterisation_config.far_plane > 0, path
    # the template's tuple-wrapped null collapses to None
    cfg = cfg_mod.from_yaml_file(
        TrainConfig, "/root/reference/config/config_template.yaml")
    assert cfg.gaussian_point_cloud_scene_config.max_num_points_ratio is None


def test_repo_config_library_loads():
    """The repo's own config library (TPU editions of the reference YAMLs,
    plus example.yaml) must load and carry the TPU capacity knobs."""
    import glob
    from taichi_3d_gaussian_splatting_tpu.training.trainer import TrainConfig
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo_root, "config", "*.yaml")))
    assert len(paths) >= 13
    for path in paths:
        cfg = cfg_mod.from_yaml_file(TrainConfig, path)
        assert cfg.rasterisation_config.max_tiles_per_point >= 4, path
        assert cfg.rasterisation_config.max_keys > 0, path
    # spot-check a ported file keeps the reference's hyperparameters
    cfg = cfg_mod.from_yaml_file(
        TrainConfig, os.path.join(repo_root, "config", "tat_truck.yaml"))
    assert cfg.num_iterations == 30000
    assert cfg.feature_learning_rate == 0.005
    assert cfg.position_learning_rate_decay_rate == 0.9847
    assert cfg.adaptive_controller_config.num_iterations_reset_alpha == 4000
    assert cfg.gaussian_point_cloud_scene_config.add_sphere is True


def test_spatially_sorted_is_a_permutation_with_locality():
    """Morton ordering permutes valid points (invalid slots stay last) and
    actually improves spatial locality of consecutive ids."""
    import numpy as np
    import jax.numpy as jnp
    from taichi_3d_gaussian_splatting_tpu.models.scene import (
        GaussianPointCloudScene)

    rng = np.random.default_rng(3)
    n = 2048
    pc = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 56)).astype(np.float32)
    invalid = (rng.random(n) < 0.25).astype(np.int8)
    scene = GaussianPointCloudScene(
        point_cloud=jnp.asarray(pc), point_cloud_features=jnp.asarray(feats),
        point_invalid_mask=jnp.asarray(invalid),
        point_object_id=jnp.asarray(np.arange(n, dtype=np.int32)))
    s2 = scene.spatially_sorted()
    # permutation: same multiset of (pc, feats) rows, object ids track
    perm = np.asarray(s2.point_object_id)
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(np.asarray(s2.point_cloud), pc[perm])
    np.testing.assert_array_equal(np.asarray(s2.point_cloud_features),
                                  feats[perm])
    np.testing.assert_array_equal(np.asarray(s2.point_invalid_mask),
                                  invalid[perm])
    # invalid slots are all at the tail
    inv2 = np.asarray(s2.point_invalid_mask)
    first_invalid = int(np.argmax(inv2)) if inv2.any() else n
    assert inv2[first_invalid:].all()
    # locality: mean distance between consecutive valid points shrinks
    valid2 = np.asarray(s2.point_cloud)[inv2 == 0]
    valid1 = pc[invalid == 0]
    d2 = np.linalg.norm(np.diff(valid2, axis=0), axis=1).mean()
    d1 = np.linalg.norm(np.diff(valid1, axis=0), axis=1).mean()
    assert d2 < 0.5 * d1, (d2, d1)
