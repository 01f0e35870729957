"""Batch-size convergence parity at horizon (VERDICT r3 item 7).

Trains the quick quality scene twice on the 8-device virtual CPU mesh with
the SAME total images seen:
  - single: batch_size=1 for N iterations (the reference's only mode,
    reference: README.md:298 lists batch training as TODO);
  - batch-8: batch_size=8 data-parallel for N/8 iterations (gradients
    SUMMED over the batch, parallel/sharding.py convention - Adam's
    second-moment normalization makes the update scale-invariant, so the
    learning rate is NOT rescaled; what differs is 8x fewer optimizer
    steps and 8x fewer controller cadence events).

Prints one JSON line per run plus a combined comparison record. Expected
outcome: batch-8 reaches a comparable held-out PSNR; any gap is the
fewer-optimizer-steps effect, not a sharding bug (gradient equivalence is
separately pinned bitwise-ish in tests/test_parallel.py).

Run:  python benchmark/batch_parity.py  (forces CPU + 8 virtual devices)
Env:  BP_RES (64), BP_VIEWS (24), BP_ITERS (1600, must be divisible by 8).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(tag, iters, batch, mesh, res, views):
    cache = f"/tmp/batch_parity_{tag}.json"
    if os.environ.get("BP_REUSE", "1") == "1" and os.path.exists(cache):
        rec = json.load(open(cache))
        print(json.dumps({"run": tag, "cached": True, **rec}), flush=True)
        return rec
    env = dict(
        os.environ,
        T3DGS_FORCE_CPU="1",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                   " --xla_force_host_platform_device_count=8"),
        QB_RES=str(res), QB_VIEWS=str(views), QB_ITERS=str(iters),
        QB_BATCH=str(batch), QB_MESH=str(mesh),
        QB_OUT=f"/tmp/batch_parity_{tag}",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "quality_benchmark.py")],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"{tag} run failed")
    rec = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    json.dump(rec, open(cache, "w"))
    print(json.dumps({"run": tag, **rec}), flush=True)
    return rec


def main():
    res = int(os.environ.get("BP_RES", "64"))
    views = int(os.environ.get("BP_VIEWS", "24"))
    iters = int(os.environ.get("BP_ITERS", "1600"))
    only = os.environ.get("BP_ONLY", "both")
    assert iters % 8 == 0
    # NOTE: 8 virtual CPU devices on few cores can starve XLA's in-process
    # collective rendezvous (hard 40 s timeout -> fatal crash); run the
    # batch-8 leg on an otherwise idle machine. Legs cache their results in
    # /tmp/batch_parity_<tag>.json so they can run in separate invocations.
    single = run("single", iters, 1, 0, res, views) \
        if only in ("both", "single") else None
    batch8 = run("batch8", iters // 8, 8, 8, res, views) \
        if only in ("both", "batch8") else None
    if single is None or batch8 is None:
        return
    print(json.dumps({
        "metric": "batch8_vs_single_holdout_psnr_delta",
        "value": round(batch8["value"] - single["value"], 2),
        "unit": "dB",
        "single_psnr": single["value"],
        "batch8_psnr": batch8["value"],
        "single_best": single["best"],
        "batch8_best": batch8["best"],
        "images_seen": iters,
    }), flush=True)


if __name__ == "__main__":
    main()
