"""North-star benchmark: frames/sec/chip at 512² one-shot inference.

Runs the flagship per-frame synthesis step (SECC-conditioned render at 128²
+ torso/bg fusion SR to 512², canonical plane cached) on the available
accelerator and prints ONE JSON line:
``{"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}``
(BASELINE.json target: >=30 fps on one v5e chip).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax

    backend = jax.default_backend()
    n_warmup, n_iters = 2, 10
    if backend == "cpu":
        print("| bench: no TPU visible, falling back to CPU timings", file=sys.stderr)
        n_iters = 3

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    frame_step, (variables, cam, secc, cano, cond) = ge.entry()
    step = jax.jit(frame_step)

    t0 = time.time()
    out = step(variables, cam, secc, cano, cond)
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"| bench: backend={backend} compile={compile_s:.1f}s "
          f"out={out.shape}", file=sys.stderr)

    for _ in range(n_warmup):
        step(variables, cam, secc, cano, cond).block_until_ready()

    t0 = time.time()
    for _ in range(n_iters):
        out = step(variables, cam, secc, cano, cond)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "frames/sec/chip at 512^2 one-shot inference (p50 per-frame)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
