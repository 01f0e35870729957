"""CI experiment summarizer: metrics parsing, markdown, quality gate."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_metrics(path):
    records = [
        {"iteration": 0, "train/loss": 0.5},
        {"iteration": 1000, "val/psnr": 22.0, "val/ssim": 0.80},
        {"iteration": 2000, "val/psnr": 25.5, "val/ssim": 0.87,
         "train/loss": 0.1},
    ]
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_read_metrics_and_markdown(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "ci"))
    import run_experiment as rx
    path = str(tmp_path / "metrics.jsonl")
    _write_metrics(path)
    final, history = rx.read_metrics(path)
    assert final["val/psnr"] == (2000, 25.5)
    assert final["train/loss"] == (2000, 0.1)
    assert history == [(1000, 22.0), (2000, 25.5)]
    md = rx.render_markdown(final, history)
    assert "| val/psnr | 2000 | 25.5 |" in md
    assert "## val/psnr progression" in md


def test_quality_gate(tmp_path):
    log_dir = tmp_path / "logs"
    os.makedirs(log_dir)
    _write_metrics(str(log_dir / "metrics.jsonl"))
    cfg = tmp_path / "c.yaml"
    cfg.write_text(f"summary-writer-log-dir: {log_dir}\n")

    def run(*extra):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "ci", "run_experiment.py"),
             "--train_config", str(cfg), "--skip_training",
             "--output", str(tmp_path / "summary.md"), *extra],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})

    ok = run("--target_psnr", "25.0", "--target_ssim", "0.86")
    assert ok.returncode == 0, ok.stdout + ok.stderr
    assert "quality gate passed" in ok.stdout
    assert os.path.exists(tmp_path / "summary.md")

    bad = run("--target_psnr", "30.0")
    assert bad.returncode == 1
    assert "QUALITY GATE FAILED" in bad.stdout
