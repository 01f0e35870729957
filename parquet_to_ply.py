"""Parquet -> official-implementation PLY converter
(reference: parquet_to_ply.py)."""

import argparse
import os


def main():
    # pure host-side format shuffling: keep jax off the TPU (the env var
    # alone is overridden by the axon plugin, so also set the config)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from taichi_3d_gaussian_splatting_tpu.models.scene import (
        GaussianPointCloudScene)

    parser = argparse.ArgumentParser()
    parser.add_argument("--parquet_path", type=str, required=True)
    parser.add_argument("--ply_path", type=str, required=True)
    args = parser.parse_args()
    scene = GaussianPointCloudScene.from_parquet(args.parquet_path)
    scene.to_ply(args.ply_path)


if __name__ == "__main__":
    main()
