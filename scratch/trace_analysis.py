"""Rank per-op device times from a jax.profiler trace.

Usage: python scratch/trace_analysis.py /tmp/trace_dir [n_frames]
Counterpart of the reference's nsys workflow (reference: benchmark/profiling.sh).
"""

import collections
import glob
import gzip
import json
import sys


def main():
    trace_dir = sys.argv[1]
    frames = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    tracefile = sorted(glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tracefile) as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    durs = collections.Counter()
    meta = {}
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in names.get(e.get("pid"), "")):
            durs[e["name"]] += e["dur"]
            if e["name"] not in meta and "args" in e:
                a = e["args"]
                meta[e["name"]] = (a.get("source", ""),
                                   a.get("bytes_accessed", ""))
    print(f"{'ms/frame':>10}  {'bytes':>12}  op  (source)")
    for name, d in durs.most_common(30):
        src, byts = meta.get(name, ("", ""))
        print(f"{d / 1000 / frames:10.2f}  {byts:>12}  {name[:50]}  {src}")


if __name__ == "__main__":
    main()
