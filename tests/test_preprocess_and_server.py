import threading

import numpy as np
import pytest


def test_segment_frames_synthetic():
    from real3dportrait_tpu.preprocess import segment_frames

    t, h, w = 6, 64, 64
    rng = np.random.RandomState(0)
    bg = np.full((h, w, 3), 100, np.uint8)
    frames = np.tile(bg, (t, 1, 1, 1))
    # moving bright square = "person"
    for i in range(t):
        frames[i, 20:50, 20 + i : 40 + i] = 220
    out = segment_frames(frames)
    assert out["segmap"].shape == (t, h, w)
    assert out["head_imgs"].shape == frames.shape
    # background reconstruction recovers the static bg away from the person
    np.testing.assert_allclose(out["bg_img"][0, 0], [100, 100, 100], atol=3)
    # person pixels detected somewhere
    assert (out["segmap"] > 0).sum() > 100


def test_extract_blink():
    from real3dportrait_tpu.preprocess.pipeline import extract_blink

    t = 10
    lm = np.zeros((t, 68, 2), np.float32)
    # open eyes: tall; frame 5: closed (flat)
    for idx, base in ((range(36, 42), 0.3), (range(42, 48), 0.3)):
        idx = list(idx)
        lm[:, idx[0]] = [base, 0.5]
        lm[:, idx[3]] = [base + 0.1, 0.5]
        lm[:, idx[1]] = [base + 0.03, 0.47]
        lm[:, idx[2]] = [base + 0.07, 0.47]
        lm[:, idx[4]] = [base + 0.07, 0.53]
        lm[:, idx[5]] = [base + 0.03, 0.53]
    closed = lm.copy()
    closed[5, :, 1] = 0.5  # collapse vertically at frame 5
    lm[5] = closed[5]
    blink = extract_blink(lm)
    assert blink.shape == (t, 1)
    assert blink[5, 0] == 1 and blink[0, 0] == 0


def test_audio_features_dict():
    from real3dportrait_tpu.preprocess import extract_audio_features

    sr = 16000
    wav = (0.2 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
    out = extract_audio_features(wav)
    assert "mel" in out and "f0" in out
    assert len(out["mel"]) == len(out["f0"])


def test_server_health_and_index():
    import urllib.request

    from real3dportrait_tpu.inference import server as srv

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            import json

            data = json.loads(r.read())
            assert data["status"] == "ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"Synthesize" in r.read()
    finally:
        httpd.shutdown()


# --- pYIN F0 tracker (`utils/audio/pitch_extractors.py:75` replacement) ----


def _octave_err_rate(f0, truth_fn, hop=320, sr=16000):
    import numpy as np

    errs = n = 0
    for t, f in enumerate(f0):
        if f <= 0:
            continue
        ft = truth_fn(t * hop / sr)
        if ft <= 0:
            continue
        n += 1
        if abs(1200 * np.log2(f / ft)) > 600:
            errs += 1
    return errs / max(n, 1), n


def test_pyin_tracks_glide_without_octave_errors():
    import numpy as np

    from real3dportrait_tpu.audio.features import extract_f0_pyin

    sr, dur = 16000, 3.0
    t = np.arange(int(sr * dur)) / sr
    f_inst = 100 * 3.0 ** (t / dur)  # 100 -> 300 Hz exponential glide
    wav = np.sin(np.cumsum(2 * np.pi * f_inst / sr)).astype(np.float32)
    f0 = extract_f0_pyin(wav)
    rate, n = _octave_err_rate(f0, lambda tt: 100 * 3.0 ** (tt / dur))
    assert n > 100
    assert rate == 0.0


def test_pyin_octave_trap_and_voicing():
    """Strong 2nd/3rd harmonics with a weak fundamental — the classic
    halving/doubling trap; plus unvoiced noise must stay unvoiced."""
    import numpy as np

    from real3dportrait_tpu.audio.features import extract_f0_pyin

    sr = 16000
    t = np.arange(sr * 2) / sr
    f_base = 140.0
    wav = (0.15 * np.sin(2 * np.pi * f_base * t)
           + 1.0 * np.sin(2 * np.pi * 2 * f_base * t)
           + 0.8 * np.sin(2 * np.pi * 3 * f_base * t)).astype(np.float32)
    f0 = extract_f0_pyin(wav)
    rate, n = _octave_err_rate(f0, lambda tt: f_base)
    assert n > 50 and rate == 0.0
    assert abs(float(np.median(f0[f0 > 0])) - f_base) < 3.0

    noise = np.random.RandomState(0).randn(sr).astype(np.float32) * 0.1
    f0n = extract_f0_pyin(noise)
    assert float((f0n > 0).mean()) < 0.05


def test_pyin_voiced_unvoiced_segmentation():
    import numpy as np

    from real3dportrait_tpu.audio.features import extract_f0_pyin

    sr = 16000
    t = np.arange(sr // 2) / sr
    tone = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    sil = np.zeros(sr // 2, np.float32)
    wav = np.concatenate([tone, sil, tone, sil])
    f0 = extract_f0_pyin(wav)
    frac = float((f0 > 0).mean())
    assert 0.4 < frac < 0.65  # ~half the stream is voiced
