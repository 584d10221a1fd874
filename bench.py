"""North-star benchmark: frames/sec/chip at 512² one-shot inference.

Prints ONE JSON line on stdout:
``{"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}``
(BASELINE.json target: >=30 fps on one v5e chip).

Architecture (hang-proof): the parent process never imports jax. All device
work happens in child processes that stream partial results to a JSON-lines
file; the parent enforces per-phase timeouts, retries dead/hung children up
to BENCH_RETRIES times, and emits the best fps observed — so an intermittent
axon-tunnel hang (observed: device->host transfers block forever at 0% CPU)
degrades to a slightly-stale number instead of a 0.0 in the round record.

Env:
  BENCH_TINY=1        use the tiny flagship (CPU smoke)
  BENCH_TIMEOUT=840   total wall-clock budget for the parent (seconds)
  BENCH_RETRIES=3     max child (re)launches
  BENCH_E2E=1         measure end-to-end audio-driven per-frame cost
                      (SECC rasterization + synthesis); default 1 on TPU
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
METRIC = "frames/sec/chip at 512^2 one-shot inference (p50 per-frame)"


def _emit(value: float, note: str = ""):
    rec = {
        "metric": METRIC,
        "value": round(value, 3),
        "unit": "fps",
        "vs_baseline": round(value / 30.0, 4),
    }
    if note:
        rec["note"] = note
    print(json.dumps(rec))
    sys.stdout.flush()


# ---------------------------------------------------------------------------
# Child: the actual benchmark. Runs under its own SIGALRM watchdog and
# appends progressive results to the file named by _BENCH_RESULTS.
# ---------------------------------------------------------------------------

def _report(path: str, **rec):
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


def child_main() -> None:
    results = os.environ["_BENCH_RESULTS"]
    budget = int(os.environ.get("_BENCH_CHILD_BUDGET", "600"))
    attempt = int(os.environ.get("_BENCH_ATTEMPT", "0"))

    def on_alarm(signum, frame):
        _report(results, event="watchdog", detail=f"child hit {budget}s alarm")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(budget)

    import jax

    if os.environ.get("BENCH_TINY", "") == "1":
        # CPU smoke: pin the cpu platform (this image's jax ignores
        # JAX_PLATFORMS; config.update is the only way)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    backend = jax.default_backend()
    tiny = os.environ.get("BENCH_TINY", "") == "1" or backend == "cpu"
    _report(results, event="start", backend=backend, tiny=tiny)

    # Pre-flight: a tiny device round-trip under the alarm. If the tunnel is
    # wedged this hangs here — cheaply, before any 90s compile.
    import numpy as np
    probe = float(np.asarray(jax.numpy.ones((8,)).sum()))
    assert probe == 8.0
    _report(results, event="preflight_ok")

    sys.path.insert(0, HERE)
    import __graft_entry__ as ge

    n_warmup, n_iters, n_windows = (1, 2, 2) if tiny else (2, 10, 3)

    t0 = time.time()
    _report(results, event="building_flagship")
    frame_step, (variables, cam, secc, cano, cond) = ge._flagship(tiny=tiny)
    fpc = getattr(frame_step, "frames_per_call", 1)
    _report(results, event="flagship_ready", seconds=round(time.time() - t0, 1),
            frames_per_call=fpc)
    step = jax.jit(frame_step)

    # CRITICAL timing discipline for the axon tunnel: block_until_ready is
    # a NO-OP there (dispatch is fire-and-forget into a server-side queue),
    # so the only way to synchronize is to FETCH a value. Fetch a 4-byte
    # scalar through a jitted reducer — the queue is in-order, so the fetch
    # completes only after every previously dispatched step finished. Large
    # fetches are also ~40 MB/s on the tunnel, so never fetch the image.
    reduce = jax.jit(lambda x: x.sum())

    def sync(x):
        return float(reduce(x))

    t0 = time.time()
    out = step(variables, cam, secc, cano, cond)
    sync(out)
    _report(results, event="compiled", seconds=round(time.time() - t0, 1),
            out_shape=list(out.shape))

    for _ in range(n_warmup):
        sync(step(variables, cam, secc, cano, cond))

    # Measurement: several independent windows, partial fps reported after
    # each, one scalar fetch per window. The parent takes the MEDIAN window
    # of the final attempt (honest p50; max kept as a side field).
    for w in range(n_windows):
        t0 = time.time()
        for _ in range(n_iters):
            out = step(variables, cam, secc, cano, cond)
        sync(out)
        dt = (time.time() - t0) / (n_iters * fpc)
        _report(results, fps=1.0 / dt, kind="frame_step", window=w, tiny=tiny,
                attempt=attempt)

    # End-to-end audio-driven per-frame cost: SECC rasterization (the real
    # per-frame preprocessing, frame-batched) + the synthesis step.
    if os.environ.get("BENCH_E2E", "1") == "1":
        try:
            _bench_e2e(results, step, variables, cam, cano, cond, tiny, attempt)
        except Exception as exc:  # noqa: BLE001 — report, keep frame_step fps
            _report(results, event="e2e_failed", detail=repr(exc)[:300])

    signal.alarm(0)
    _report(results, event="done")


def _bench_e2e(results, step, variables, cam, cano, cond, tiny,
               attempt: int = 0) -> None:
    """Per-frame cost of SECC raster + synthesis, frame-batched raster.

    Models the audio-driven per-frame loop (`inference/real3d_infer.py:436-489`
    in the reference): cano/src SECC rendered once per video, per-frame work =
    tgt SECC raster (frame-batched, 256² z-buffer upsampled to the 512² cond
    map) + the cached-plane synthesis step.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.geometry import synthetic_bfm
    from real3dportrait_tpu.geometry.secc_renderer import SECCRenderer

    reduce = jax.jit(lambda x: x.sum())

    # synthesis frames per device step (must divide the raster batch)
    spc = getattr(step, "frames_per_call", None) or getattr(
        getattr(step, "__wrapped__", step), "frames_per_call", 1)
    # raster frame batch 16: measured 7.8 ms/frame vs 9.2 at fb=8 (r4)
    fb = 2 if tiny else max(int(os.environ.get("BENCH_SECC_BATCH", "16")), spc)
    fb = (fb // spc) * spc
    # z-buffer resolution: the NCC cond maps are smooth color fields and the
    # SECC backbone consumes them through a 7x7 STRIDE-4 patch embed, so a
    # reduced raster + bilinear upsample loses almost nothing the backbone
    # can see (192^2 raster = 39.2 dB after stride-4 pooling vs the native
    # 512^2 raster; 256^2 = 41.7 dB — measured r4, BASELINE.md)
    raster_res = 64 if tiny else int(os.environ.get("BENCH_SECC_RES", "192"))
    out_res = 64 if tiny else 512     # cond-map resolution fed to the model
    # production mesh scale: BFM09 = 35709 verts / ~70k faces
    assets = synthetic_bfm(n_vertices=256 if tiny else 35709)
    renderer = SECCRenderer(
        assets, rasterize_size=raster_res, output_resolution=out_res
    )

    rng = np.random.RandomState(0)
    ident = jnp.asarray(np.tile(rng.randn(1, 80).astype(np.float32) * 0.1, (fb, 1)))
    exps = jnp.asarray(rng.randn(fb, 64).astype(np.float32) * 0.1)
    euler = jnp.zeros((fb, 3), jnp.float32)
    trans = jnp.zeros((fb, 3), jnp.float32)

    t0 = time.time()
    _, cano_secc = renderer.render(ident[:1], jnp.zeros((1, 64)), euler[:1], trans[:1])
    _, src_secc = renderer.render(ident, exps, euler, trans)
    float(reduce(src_secc))  # fetch-sync (block_until_ready is a no-op here)
    _report(results, event="e2e_raster_compiled", seconds=round(time.time() - t0, 1))
    src1 = src_secc[:1]

    def frames_cond(tgt_secc_f):  # [spc,H,W,3] -> [spc,H,W,9]
        n = tgt_secc_f.shape[0]
        return jnp.concatenate([
            jnp.broadcast_to(cano_secc, (n,) + cano_secc.shape[1:]),
            jnp.broadcast_to(src1, (n,) + src1.shape[1:]),
            tgt_secc_f,
        ], axis=-1)

    # warmup both phases once
    _, tgt = renderer.render(ident, exps, euler, trans)
    float(reduce(step(variables, cam, frames_cond(tgt[:spc]), cano, cond)))

    # several independent windows (median taken by the parent)
    n_windows = 2 if tiny else 3
    n_iters = 2 if tiny else 4
    for w in range(n_windows):
        t0 = time.time()
        for _ in range(n_iters):
            _, tgt = renderer.render(ident, exps, euler, trans)
            for f in range(0, fb, spc):
                out = step(variables, cam, frames_cond(tgt[f:f + spc]), cano, cond)
        float(reduce(out))  # in-order queue: syncs every raster + step above
        dt = (time.time() - t0) / (n_iters * fb)
        _report(results, fps=1.0 / dt, kind="e2e", window=w, tiny=tiny,
                attempt=attempt)


# ---------------------------------------------------------------------------
# Parent: orchestration.
# ---------------------------------------------------------------------------

def _read_results(path: str):
    recs = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        recs.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass  # torn write from a killed child
    except FileNotFoundError:
        pass
    return recs


def parent_main() -> None:
    total_budget = int(os.environ.get("BENCH_TIMEOUT", "840"))
    retries = int(os.environ.get("BENCH_RETRIES", "3"))
    deadline = time.time() + total_budget

    fd, results = tempfile.mkstemp(prefix="bench_results_", suffix=".jsonl")
    os.close(fd)

    attempt = 0
    notes = []
    while attempt < retries and time.time() < deadline - 10:
        attempt += 1
        child_budget = max(60, int(deadline - time.time()) - 20)
        env = dict(os.environ)
        env["_BENCH_RESULTS"] = results
        env["_BENCH_CHILD_BUDGET"] = str(child_budget)
        env["_BENCH_CHILD"] = "1"
        env["_BENCH_ATTEMPT"] = str(attempt)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, cwd=HERE, stdout=sys.stderr, stderr=sys.stderr,
        )
        # Poll: kill the child if it stops making progress (no new result
        # lines for `stall_s`) or the global deadline passes.
        stall_s = 420  # must cover the init+cano+step first-compiles quietly
        last_size, last_progress = -1, time.time()
        while proc.poll() is None:
            time.sleep(2)
            try:
                size = os.path.getsize(results)
            except OSError:
                size = 0
            if size != last_size:
                last_size, last_progress = size, time.time()
            if time.time() - last_progress > stall_s or time.time() > deadline:
                proc.kill()
                proc.wait()
                notes.append(f"attempt {attempt}: child stalled/deadline, killed")
                break
        if proc.returncode == 0:
            break
        if proc.returncode not in (None, 0):
            notes.append(f"attempt {attempt}: child rc={proc.returncode}")

    recs = _read_results(results)
    try:
        os.unlink(results)
    except OSError:
        pass

    def p50_of_final_attempt(kind: str) -> tuple[float, float] | None:
        """(median, max) over the LAST attempt that produced this kind."""
        by_attempt: dict[int, list[float]] = {}
        for r in recs:
            if r.get("kind") == kind:
                by_attempt.setdefault(int(r.get("attempt", 0)), []).append(r["fps"])
        if not by_attempt:
            return None
        vals = sorted(by_attempt[max(by_attempt)])
        mid = len(vals) // 2
        p50 = vals[mid] if len(vals) % 2 else 0.5 * (vals[mid - 1] + vals[mid])
        return p50, max(v for vs in by_attempt.values() for v in vs)

    frame = p50_of_final_attempt("frame_step")
    e2e = p50_of_final_attempt("e2e")
    tiny = any(r.get("tiny") for r in recs if "fps" in r or r.get("event") == "start")

    note_bits = []
    if tiny:
        note_bits.append("tiny-config CPU smoke (not the 512^2 number)")
    else:
        sc = os.environ.get("BENCH_SAMPLES_COARSE", "16")
        sf = os.environ.get("BENCH_SAMPLES_FINE", "32")
        if (sc, sf) == ("16", "32"):
            note_bits.append("quadrature = shipped 'fast' preset 16+32 "
                             "samples/ray (64.5 dB PSNR of the reference "
                             "48+48 render, study in BASELINE.md r4; "
                             "BENCH_SAMPLES_*=48 restores reference)")
        else:
            note_bits.append(f"quadrature = {sc}+{sf} samples/ray")
    if notes:
        note_bits.append("; ".join(notes))

    if e2e is not None:
        # Headline: true per-frame cost of audio-driven inference (SECC
        # raster + synthesis), MEDIAN window of the final attempt; max is a
        # side note. frame_step fps reported alongside.
        if frame is not None:
            note_bits.insert(0, f"e2e incl. SECC raster (max window "
                                f"{e2e[1]:.1f}); synthesis-only step p50 = "
                                f"{frame[0]:.1f} fps")
        _emit(e2e[0], note="; ".join(note_bits))
    elif frame is not None:
        note_bits.insert(0, "synthesis step only (e2e SECC raster phase "
                            f"missing; max window {frame[1]:.1f})")
        _emit(frame[0], note="; ".join(note_bits))
    else:
        events = [r.get("event") or r.get("detail") for r in recs][-4:]
        _emit(0.0, note=f"no fps measured after {attempt} attempts; "
                        f"last events: {events}; {'; '.join(notes)}")
        sys.exit(2)


def main() -> None:
    if os.environ.get("_BENCH_CHILD") == "1":
        child_main()
    else:
        parent_main()


if __name__ == "__main__":
    main()
