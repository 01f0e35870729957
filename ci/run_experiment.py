"""End-to-end experiment runner / quality gate.

Rebuild of the reference CI orchestration (reference: ci/run_experiment.py,
.github/workflows/run_experiment.yml). The reference launches a SageMaker
spot GPU job and scrapes `key=value;` lines from the training log into a PR
comment (reference: ci/run_experiment.py:16-107,227-244). The TPU rebuild
runs training directly on the runner's TPU, reads the structured
metrics.jsonl sink, renders the same style of markdown table, and acts as a
pass/fail gate on target metrics.

Usage:
  python ci/run_experiment.py --train_config config/example.yaml \
      --target_psnr 25.0 --target_ssim 0.86 --output summary.md
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_metrics(metrics_path: str):
    """Last value per metric key + full val_psnr history."""
    final = {}
    history = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            it = rec.pop("iteration")
            for k, v in rec.items():
                final[k] = (it, v)
            if "val/psnr" in rec:
                history.append((it, rec["val/psnr"]))
    return final, history


def render_markdown(final: dict, history: list) -> str:
    lines = ["# Experiment results", "", "| metric | iteration | value |",
             "|---|---|---|"]
    for key in sorted(final):
        it, v = final[key]
        lines.append(f"| {key} | {it} | {v:.6g} |")
    if history:
        lines += ["", "## val/psnr progression", "",
                  "| iteration | psnr |", "|---|---|"]
        for it, v in history:
            lines.append(f"| {it} | {v:.4f} |")
    return "\n".join(lines) + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_config", type=str, required=True)
    parser.add_argument("--log_dir", type=str, default=None,
                        help="defaults to the config's summary dir")
    parser.add_argument("--target_psnr", type=float, default=None)
    parser.add_argument("--target_ssim", type=float, default=None)
    parser.add_argument("--output", type=str, default="experiment_summary.md")
    parser.add_argument("--skip_training", action="store_true",
                        help="only summarize an existing metrics.jsonl")
    args = parser.parse_args()

    from taichi_3d_gaussian_splatting_tpu.training.trainer import TrainConfig
    config = TrainConfig.from_yaml_file(args.train_config)
    log_dir = args.log_dir or config.summary_writer_log_dir

    if not args.skip_training:
        result = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "..",
                          "gaussian_point_train.py"),
             "--train_config", args.train_config])
        if result.returncode != 0:
            print("training failed")
            sys.exit(result.returncode)

    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    final, history = read_metrics(metrics_path)
    summary = render_markdown(final, history)
    with open(args.output, "w") as f:
        f.write(summary)
    print(summary)

    failed = []
    if args.target_psnr is not None:
        psnr = final.get("val/psnr", (None, float("-inf")))[1]
        if psnr < args.target_psnr:
            failed.append(f"val/psnr {psnr:.3f} < target {args.target_psnr}")
    if args.target_ssim is not None:
        ssim = final.get("val/ssim", (None, float("-inf")))[1]
        if ssim < args.target_ssim:
            failed.append(f"val/ssim {ssim:.4f} < target {args.target_ssim}")
    if failed:
        print("QUALITY GATE FAILED:\n  " + "\n  ".join(failed))
        sys.exit(1)
    print("quality gate passed")


if __name__ == "__main__":
    main()
