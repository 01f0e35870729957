"""Train CLI (reference: gaussian_point_train.py)."""

import argparse

from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_config", type=str, required=False)
    parser.add_argument("--gen_template_only", action="store_true",
                        help="Generate a template config file")
    args = parser.parse_args()
    if args.gen_template_only:
        TrainConfig().to_yaml_file(args.train_config or "config_template.yaml")
        return
    config = TrainConfig.from_yaml_file(args.train_config)
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()


if __name__ == "__main__":
    main()
