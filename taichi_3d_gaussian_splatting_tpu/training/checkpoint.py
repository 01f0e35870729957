"""Full training-state checkpointing (scene + optimizer moments + controller
accumulators + iteration counter + PRNG key).

The reference's only checkpoint is the scene parquet; a spot interruption
loses optimizer state and restarts training from scratch (SURVEY.md section 5
/ reference: ci/run_experiment.py:189-190 relies on SageMaker restarts).
This module closes that gap with a flat .npz snapshot of the whole jax state
pytree - dependency-free, byte-exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten_state(tree) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree.flatten(tree)
    out = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return out, treedef


def save_checkpoint(path: str, state_tree, iteration: int,
                    best_psnr: float = 0.0):
    """Write the full state pytree + host counters to a single .npz file."""
    flat, _ = _flatten_state(state_tree)
    flat["__iteration__"] = np.asarray(iteration, np.int64)
    flat["__best_psnr__"] = np.asarray(best_psnr, np.float64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template) -> Tuple[Any, int, float]:
    """Load a checkpoint into the structure of `state_template`.

    The template provides the pytree structure and dtypes; shapes must match
    (the fixed-capacity design guarantees that across runs with the same
    config)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(state_template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        expect = np.asarray(leaf)
        assert arr.shape == expect.shape, (
            f"checkpoint leaf {i} shape {arr.shape} != {expect.shape}; "
            "was the scene capacity or config changed?")
        restored.append(arr.astype(expect.dtype))
    tree = jax.tree.unflatten(treedef, restored)
    iteration = int(data["__iteration__"])
    best_psnr = float(data["__best_psnr__"])
    return tree, iteration, best_psnr
