"""Rewrite dataset paths in an example training YAML
(reference: tools/prepare_config.py)."""

import argparse
from pathlib import Path

import yaml


def main():
    parser = argparse.ArgumentParser(
        "Prepare training config for 3D Gaussian Splatting")
    parser.add_argument("--example_config", type=str, required=True)
    parser.add_argument("--input_prefix", type=str, required=True,
                        help="Prefix holding train.json/val.json/point_cloud.parquet")
    parser.add_argument("--output", type=str, default="train.yaml")
    args = parser.parse_args()
    with open(args.example_config) as f:
        config = yaml.safe_load(f)
    prefix = Path(args.input_prefix)
    config["train-dataset-json-path"] = str(prefix / "train.json")
    config["val-dataset-json-path"] = str(prefix / "val.json")
    config["pointcloud-parquet-path"] = str(prefix / "point_cloud.parquet")
    config["summary-writer-log-dir"] = args.input_prefix
    config["output-model-dir"] = args.input_prefix
    with open(args.output, "w") as w:
        yaml.dump(config, w)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
