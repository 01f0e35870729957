#!/bin/bash
# Container entrypoint for the CI experiment gate (role parity with the
# reference's ci/entrypoint.sh, which symlinks the SageMaker input channel
# and launches the train CLI).
set -euo pipefail

if [ -z "${TRAIN_CONFIG:-}" ]; then
    echo "TRAIN_CONFIG is not set" >&2
    exit 1
fi

# dataset volume convention: the config's dataset paths are relative to
# /data (mounted by the workflow); symlink it into the workdir like the
# reference links /opt/ml/input/data/training/image
if [ -d /data ] && [ ! -e data ]; then
    ln -s /data data
fi

exec python ci/run_experiment.py --train_config "${TRAIN_CONFIG}" \
    --target_psnr "${TARGET_PSNR:-24.0}" \
    --target_ssim "${TARGET_SSIM:-0.8}" \
    --output "${OUTPUT_SUMMARY:-/data/summary.md}"
