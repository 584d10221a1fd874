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
