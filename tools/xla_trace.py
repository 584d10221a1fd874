"""Per-op device-time profile of the flagship frame step via jax.profiler.

``jax.profiler.trace`` works on the axon-tunneled TPU backend (verified
round 4) and emits a Chrome trace with one event per executed HLO, including
the full HLO long_name (shapes + layouts). This is the ground truth the
isolated-slice timings in :mod:`tools.profile_frame` approximate — use it to
find layout copies, selects, and fusion boundaries that slice timing cannot
see (it located the 3.7 ms/frame gather fill-mode selects and the
786k x 128 layout flips, BASELINE.md round 4).

Usage: python tools/xla_trace.py [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TRACE_DIR = "/tmp/real3dportrait_tpu_trace"
N_FRAMES = 3


def capture() -> None:
    import jax

    import __graft_entry__ as ge

    frame_step, args = ge._flagship(tiny=False)
    step = jax.jit(frame_step)
    reduce = jax.jit(lambda x: x.sum())
    out = step(*args)
    float(reduce(out))  # compile + warm
    out = step(*args)
    float(reduce(out))
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(N_FRAMES):
            out = step(*args)
        float(reduce(out))


def report(top_n: int = 40) -> None:
    path = sorted(glob.glob(
        f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    names = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name")
    tpu = [p for p, n in names.items() if n and "TPU" in n]
    dur: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    args_ = {}
    tot = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in tpu:
            continue
        n = e["name"]
        if n.startswith("jit_"):  # outer program events double-count
            continue
        dur[n] += e.get("dur", 0.0)
        cnt[n] += 1
        tot += e.get("dur", 0.0)
        if e.get("args"):
            args_[n] = e["args"]
    print(f"total device-op time: {tot / N_FRAMES / 1000:.2f} ms/frame")
    for name, d in dur.most_common(top_n):
        a = args_.get(name, {})
        extra = (a.get("long_name") or a.get("tf_op") or "").replace(
            "\n", " ")[:140]
        print(f"{name[:40]:40s} {d / N_FRAMES / 1000:>8.3f} ms "
              f"x{cnt[name] // N_FRAMES:3d}  {extra}")


if __name__ == "__main__":
    capture()
    report(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
