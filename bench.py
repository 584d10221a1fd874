"""North-star benchmark: frames/sec/chip at 512² one-shot inference.

Runs the flagship per-frame synthesis step (SECC-conditioned render at 128²
+ torso/bg fusion SR to 512², canonical plane cached) on the available
accelerator and prints ONE JSON line:
``{"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}``
(BASELINE.json target: >=30 fps on one v5e chip).

Env:
  BENCH_TINY=1        use the tiny flagship (CPU smoke)
  BENCH_TIMEOUT=900   watchdog seconds (the axon tunnel has been observed to
                      hang on device->host transfers; emit a diagnostic JSON
                      instead of hanging the driver)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time


def _emit(value: float, note: str = ""):
    rec = {
        "metric": "frames/sec/chip at 512^2 one-shot inference (p50 per-frame)",
        "value": round(value, 3),
        "unit": "fps",
        "vs_baseline": round(value / 30.0, 4),
    }
    if note:
        rec["note"] = note
    print(json.dumps(rec))
    sys.stdout.flush()


def _watchdog(timeout_s: int):
    def handler(signum, frame):
        _emit(0.0, f"watchdog: benchmark did not complete within {timeout_s}s "
                   "(device<->host transfer hang?)")
        os._exit(2)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(timeout_s)


def main() -> None:
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "900"))
    _watchdog(timeout_s)

    import jax

    backend = jax.default_backend()
    tiny = os.environ.get("BENCH_TINY", "") == "1" or backend == "cpu"
    n_warmup, n_iters = (1, 3) if tiny else (2, 10)
    if backend == "cpu":
        print("| bench: no TPU visible, CPU timings on the tiny flagship",
              file=sys.stderr)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge

    frame_step, (variables, cam, secc, cano, cond) = ge._flagship(tiny=tiny)
    step = jax.jit(frame_step)

    t0 = time.time()
    out = step(variables, cam, secc, cano, cond)
    out.block_until_ready()
    print(f"| bench: backend={backend} tiny={tiny} "
          f"compile={time.time() - t0:.1f}s out={out.shape}", file=sys.stderr)

    for _ in range(n_warmup):
        step(variables, cam, secc, cano, cond).block_until_ready()

    t0 = time.time()
    for _ in range(n_iters):
        out = step(variables, cam, secc, cano, cond)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iters
    signal.alarm(0)
    _emit(1.0 / dt, note="tiny-config CPU smoke (not the 512^2 number)" if tiny else "")


if __name__ == "__main__":
    main()
