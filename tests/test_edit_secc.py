import numpy as np

from real3dportrait_tpu.inference.edit_secc import (
    blink_eye_for_secc,
    inject_blink_to_secc_sequence,
)


def _secc_with_eyes(h=64, w=64):
    """Synthetic SECC: face block with two background-colored eye holes."""
    secc = np.full((h, w, 3), -1.0, np.float32)
    secc[h // 8 : 7 * h // 8, w // 8 : 7 * w // 8] = 0.5  # face
    secc[h // 3 : h // 3 + 6, w // 3 : w // 3 + 6] = -1.0  # left eye hole
    secc[h // 3 : h // 3 + 6, 2 * w // 3 - 6 : 2 * w // 3] = -1.0  # right
    return secc


def test_blink_closes_holes():
    secc = _secc_with_eyes()
    holes_before = int((np.all(secc < -0.99, -1)[16:32, 16:48]).sum())
    closed = blink_eye_for_secc(secc, close_percent=1.0)
    holes_after = int((np.all(closed < -0.99, -1)[16:32, 16:48]).sum())
    assert holes_before > 0
    assert holes_after < holes_before * 0.35
    # zero percent is identity
    np.testing.assert_array_equal(blink_eye_for_secc(secc, 0.0), secc)


def test_blink_noop_without_eyes():
    secc = np.full((32, 32, 3), -1.0, np.float32)
    out = blink_eye_for_secc(secc, 0.8)
    np.testing.assert_array_equal(out, secc)


def test_inject_blink_sequence():
    seq = np.stack([_secc_with_eyes() for _ in range(60)])
    out = inject_blink_to_secc_sequence(seq, fps=25, period_s=1.0, seed=0)
    assert out.shape == seq.shape
    changed = [i for i in range(60) if not np.array_equal(out[i], seq[i])]
    assert len(changed) >= 5  # at least one blink profile applied
    # unblinked frames untouched
    untouched = [i for i in range(60) if i not in changed]
    assert untouched
