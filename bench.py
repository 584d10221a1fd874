"""North-star benchmark: frames/sec/chip at 512² one-shot inference.

Prints ONE JSON line on stdout:
``{"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30, ...}``
(BASELINE.json target: >=30 fps on one v5e chip). The headline ``value`` is
the END-TO-END per-frame cost (SECC raster + synthesis) at the shipped
'fast' sampling preset; the same record carries ``synthesis_fps`` and the
reference-quadrature (48+48) numbers so the quadrature trade is never
implicit (VERDICT r4 ask #1).

Architecture (driver-proof, reworked r5 per VERDICT r4 ask #2):
  * the parent never imports jax; children stream results to a JSONL file;
  * children enable a PERSISTENT XLA compilation cache (verified on the
    axon backend: 4.6 s -> 0.07 s across processes), so a retry after a
    stall-kill resumes from whatever compiled before the kill instead of
    paying full recompilation;
  * the e2e phase runs FIRST — the number the round is judged on lands
    before anything optional;
  * children announce each phase with its own stall budget (a first
    compile may sit quiet for minutes; a measurement window may not), and
    the parent scales its no-progress kill timer to the announced phase.

Env:
  BENCH_TINY=1        use the tiny flagship (CPU smoke)
  BENCH_TIMEOUT=840   total wall-clock budget for the parent (seconds)
  BENCH_RETRIES=3     max child (re)launches
  BENCH_E2E=1         measure end-to-end audio-driven per-frame cost
                      (SECC rasterization + synthesis); default 1
  BENCH_REF_QUAD=1    also measure the reference 48+48 quadrature
                      (default 1; phase is last and optional)
  BENCH_CACHE_DIR     persistent XLA compile-cache dir
                      (default /tmp/r3dp_xla_cache)
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
METRIC = "frames/sec/chip at 512^2 one-shot inference (p50 per-frame, e2e)"
DEFAULT_STALL_S = 420


def _emit(value: float, note: str = "", extra: dict | None = None):
    rec = {
        "metric": METRIC,
        "value": round(value, 3),
        "unit": "fps",
        "vs_baseline": round(value / 30.0, 4),
    }
    if extra:
        rec.update(extra)
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


def _phase(path: str, name: str, stall_s: int):
    """Announce a phase and the no-progress budget the parent should allow
    it. Compiles may sit quiet for minutes (first run on a contended
    tunnel); measurement windows must produce a line every few seconds."""
    _report(path, event="phase", phase=name, stall_s=stall_s)


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

    # Persistent compilation cache: a killed/retried child resumes from the
    # programs that already compiled (entries are written as each program
    # finishes, so even a mid-compile kill keeps its predecessors).
    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/r3dp_xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # cache is an optimization, never a dependency
        _report(results, event="cache_unavailable", detail=repr(exc)[:200])

    if os.environ.get("BENCH_TINY", "") == "1":
        # CPU smoke: pin the cpu platform (this image's jax ignores
        # JAX_PLATFORMS; config.update is the only way)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    backend = jax.default_backend()
    tiny = os.environ.get("BENCH_TINY", "") == "1" or backend == "cpu"
    _report(results, event="start", backend=backend, tiny=tiny,
            attempt=attempt)

    # Pre-flight: a tiny device round-trip under the alarm. If the tunnel is
    # wedged this hangs here — cheaply, before any 90s compile.
    _phase(results, "preflight", 120)
    import numpy as np
    probe = float(np.asarray(jax.numpy.ones((8,)).sum()))
    assert probe == 8.0
    _report(results, event="preflight_ok")

    sys.path.insert(0, HERE)
    import __graft_entry__ as ge

    reduce = jax.jit(lambda x: x.sum())

    # CRITICAL timing discipline for the axon tunnel: block_until_ready is
    # a NO-OP there (dispatch is fire-and-forget into a server-side queue),
    # so the only way to synchronize is to FETCH a value. Fetch a 4-byte
    # scalar through a jitted reducer — the queue is in-order, so the fetch
    # completes only after every previously dispatched step finished. Large
    # fetches are also ~40 MB/s on the tunnel, so never fetch the image.
    def sync(x):
        return float(reduce(x))

    def build_step(samples=None, label="flagship"):
        t0 = time.time()
        _phase(results, f"build_{label}", 600)
        frame_step, args = ge._flagship(tiny=tiny, samples=samples)
        fpc = getattr(frame_step, "frames_per_call", 1)
        step = jax.jit(frame_step)
        out = step(*args)
        sync(out)
        _report(results, event=f"{label}_compiled",
                seconds=round(time.time() - t0, 1), frames_per_call=fpc)
        return step, args, fpc

    def measure_step(step, args, fpc, kind, n_warmup, n_iters, n_windows):
        _phase(results, f"measure_{kind}", 120)
        for _ in range(n_warmup):
            sync(step(*args))
        for w in range(n_windows):
            t0 = time.time()
            for _ in range(n_iters):
                out = step(*args)
            sync(out)
            dt = (time.time() - t0) / (n_iters * fpc)
            _report(results, fps=1.0 / dt, kind=kind, window=w, tiny=tiny,
                    attempt=attempt)

    n_warmup, n_iters, n_windows = (1, 2, 2) if tiny else (2, 10, 3)
    e2e_on = os.environ.get("BENCH_E2E", "1") == "1"

    # --- shipped default ('fast' preset) — THE number, measured first ----
    step, args, fpc = build_step(label="flagship")
    raster = _build_raster(results, step, args, tiny) if e2e_on else None
    if raster is not None:
        _bench_e2e(results, step, args, raster, "e2e", tiny, attempt)
    measure_step(step, args, fpc, "frame_step", n_warmup, n_iters, n_windows)

    # --- reference quadrature (48+48) — same record, never implicit ------
    if not tiny and os.environ.get("BENCH_REF_QUAD", "1") == "1":
        del step, args
        step_r, args_r, fpc_r = build_step(samples=(48, 48), label="ref_quad")
        if raster is not None:
            _bench_e2e(results, step_r, args_r, raster, "e2e_ref", tiny,
                       attempt)
        measure_step(step_r, args_r, fpc_r, "frame_step_ref",
                     n_warmup, n_iters, 2)

    signal.alarm(0)
    _report(results, event="done")


def _build_raster(results, step, args, tiny):
    """Compile the SECC rasterizer + conditioning closure for the e2e loop.

    Models the audio-driven per-frame loop (`inference/real3d_infer.py:436-489`
    in the reference): cano/src SECC rendered once per video, per-frame work =
    tgt SECC raster (frame-batched, reduced z-buffer upsampled to the 512²
    cond map) + the cached-plane synthesis step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.geometry import synthetic_bfm
    from real3dportrait_tpu.geometry.secc_renderer import SECCRenderer

    try:
        _phase(results, "compile_raster", 600)
        reduce = jax.jit(lambda x: x.sum())
        spc = getattr(step, "frames_per_call", None) or getattr(
            getattr(step, "__wrapped__", step), "frames_per_call", 1)
        # raster frame batch 16: measured 7.8 ms/frame vs 9.2 at fb=8 (r4)
        fb = 2 if tiny else max(int(os.environ.get("BENCH_SECC_BATCH", "16")),
                                spc)
        fb = (fb // spc) * spc
        # z-buffer resolution study: BASELINE.md r4 (the backbone reads the
        # smooth NCC cond maps through a 7x7 stride-4 patch embed)
        raster_res = 64 if tiny else int(os.environ.get("BENCH_SECC_RES",
                                                        "192"))
        out_res = 64 if tiny else 512
        # production mesh scale: BFM09 = 35709 verts / ~70k faces
        assets = synthetic_bfm(n_vertices=256 if tiny else 35709)
        renderer = SECCRenderer(
            assets, rasterize_size=raster_res, output_resolution=out_res
        )

        rng = np.random.RandomState(0)
        ident = jnp.asarray(
            np.tile(rng.randn(1, 80).astype(np.float32) * 0.1, (fb, 1)))
        exps = jnp.asarray(rng.randn(fb, 64).astype(np.float32) * 0.1)
        euler = jnp.zeros((fb, 3), jnp.float32)
        trans = jnp.zeros((fb, 3), jnp.float32)

        t0 = time.time()
        _, cano_secc = renderer.render(ident[:1], jnp.zeros((1, 64)),
                                       euler[:1], trans[:1])
        _, src_secc = renderer.render(ident, exps, euler, trans)
        float(reduce(src_secc))  # fetch-sync
        _report(results, event="raster_compiled",
                seconds=round(time.time() - t0, 1))
        return dict(renderer=renderer, cano_secc=cano_secc,
                    src1=src_secc[:1], ident=ident, exps=exps, euler=euler,
                    trans=trans, fb=fb, spc=spc)
    except Exception as exc:  # noqa: BLE001 — report, keep frame_step fps
        _report(results, event="raster_failed", detail=repr(exc)[:300])
        return None


def _bench_e2e(results, step, args, raster, kind, tiny, attempt) -> None:
    """Per-frame cost of SECC raster + synthesis, frame-batched raster."""
    import jax
    import jax.numpy as jnp

    variables, cam, _, cano, cond = args
    renderer = raster["renderer"]
    cano_secc, src1 = raster["cano_secc"], raster["src1"]
    ident, exps = raster["ident"], raster["exps"]
    euler, trans = raster["euler"], raster["trans"]
    fb, spc = raster["fb"], raster["spc"]
    reduce = jax.jit(lambda x: x.sum())

    try:
        def frames_cond(tgt_secc_f):  # [spc,H,W,3] -> [spc,H,W,9]
            n = tgt_secc_f.shape[0]
            return jnp.concatenate([
                jnp.broadcast_to(cano_secc, (n,) + cano_secc.shape[1:]),
                jnp.broadcast_to(src1, (n,) + src1.shape[1:]),
                tgt_secc_f,
            ], axis=-1)

        # warmup both phases once (the e2e step graph differs from the
        # frame-step graph only in the cond feed — usually a cache hit)
        _phase(results, f"compile_{kind}", 600)
        _, tgt = renderer.render(ident, exps, euler, trans)
        float(reduce(step(variables, cam, frames_cond(tgt[:spc]), cano,
                          cond)))

        _phase(results, f"measure_{kind}", 120)
        n_windows = 2 if tiny else 3
        n_iters = 2 if tiny else 4
        for w in range(n_windows):
            t0 = time.time()
            for _ in range(n_iters):
                _, tgt = renderer.render(ident, exps, euler, trans)
                for f in range(0, fb, spc):
                    out = step(variables, cam, frames_cond(tgt[f:f + spc]),
                               cano, cond)
            float(reduce(out))  # in-order queue: syncs every dispatch above
            dt = (time.time() - t0) / (n_iters * fb)
            _report(results, fps=1.0 / dt, kind=kind, window=w, tiny=tiny,
                    attempt=attempt)
    except Exception as exc:  # noqa: BLE001 — report, keep other numbers
        _report(results, event=f"{kind}_failed", detail=repr(exc)[:300])


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
        # lines) within the CURRENT PHASE's announced stall budget, or the
        # global deadline passes. Compile phases announce minutes; measure
        # phases announce ~2 min, so a wedged-tunnel fetch dies fast and the
        # retry resumes from the persistent compile cache.
        last_size, last_progress = -1, time.time()
        stall_s = DEFAULT_STALL_S
        while proc.poll() is None:
            time.sleep(2)
            try:
                size = os.path.getsize(results)
            except OSError:
                size = 0
            if size != last_size:
                last_size, last_progress = size, time.time()
                recs = _read_results(results)
                for r in reversed(recs):
                    if r.get("event") == "phase":
                        stall_s = int(r.get("stall_s", DEFAULT_STALL_S))
                        break
            if time.time() - last_progress > stall_s or time.time() > deadline:
                proc.kill()
                proc.wait()
                notes.append(f"attempt {attempt}: child stalled/deadline, "
                             "killed")
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
    e2e_ref = p50_of_final_attempt("e2e_ref")
    frame_ref = p50_of_final_attempt("frame_step_ref")
    tiny = any(r.get("tiny") for r in recs if "fps" in r or r.get("event") == "start")

    extra: dict = {}
    note_bits = []
    if tiny:
        note_bits.append("tiny-config CPU smoke (not the 512^2 number)")
    else:
        # derive the preset note from the shipped constants, never a copy
        # of them (ADVICE r4: string literals desynchronize)
        sc = os.environ.get("BENCH_SAMPLES_COARSE", "")
        sf = os.environ.get("BENCH_SAMPLES_FINE", "")
        if sc or sf:
            note_bits.append(f"quadrature override = {sc or '?'}+{sf or '?'} "
                             "samples/ray (BENCH_SAMPLES_* env)")
        else:
            try:
                sys.path.insert(0, HERE)
                from real3dportrait_tpu.inference.pipeline import (
                    SAMPLING_PRESETS, SHIPPED_SAMPLING_PRESET,
                )
                c, f = SAMPLING_PRESETS[SHIPPED_SAMPLING_PRESET]
                note_bits.append(
                    f"quadrature = shipped {SHIPPED_SAMPLING_PRESET!r} "
                    f"preset {c}+{f} samples/ray; ref_quadrature_* fields "
                    "are the same pipeline at the reference 48+48")
            except Exception:
                pass
    if notes:
        note_bits.append("; ".join(notes))

    if frame is not None:
        extra["synthesis_fps"] = round(frame[0], 3)
    if e2e_ref is not None:
        extra["ref_quadrature_fps"] = round(e2e_ref[0], 3)
    if frame_ref is not None:
        extra["ref_quadrature_synthesis_fps"] = round(frame_ref[0], 3)

    if e2e is not None:
        # Headline: true per-frame cost of audio-driven inference (SECC
        # raster + synthesis), MEDIAN window of the final attempt that
        # measured it; max is a side note.
        bits = [f"e2e incl. SECC raster (max window {e2e[1]:.1f})"]
        if frame is not None:
            bits.append(f"synthesis-only step p50 = {frame[0]:.1f} fps")
        note_bits.insert(0, "; ".join(bits))
        _emit(e2e[0], note="; ".join(note_bits), extra=extra)
    elif frame is not None:
        note_bits.insert(0, "synthesis step only (e2e SECC raster phase "
                            f"missing; max window {frame[1]:.1f})")
        _emit(frame[0], note="; ".join(note_bits), extra=extra)
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
