"""Tests for host-side source preparation (segment_utils)."""

import numpy as np

from real3dportrait_tpu.preprocess.segment_utils import (
    crop_on_face_area,
    extract_background_knn,
    inpaint_torso,
    prepare_source,
)


def _synthetic_scene(h=64, w=64, head_col=30):
    """bg gradient + head square over a torso block below it."""
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(10, 90, w, dtype=np.uint8)[None, :]
    segmap = np.zeros((h, w), np.int64)
    # torso: bottom third, wide
    segmap[44:, 10:54] = 4
    img[44:, 10:54] = (200, 60, 60)
    # neck: small band
    segmap[38:44, head_col - 4 : head_col + 4] = 2
    img[38:44, head_col - 4 : head_col + 4] = (180, 140, 120)
    # head: block sitting on the neck
    segmap[14:38, head_col - 10 : head_col + 10] = 3
    img[14:38, head_col - 10 : head_col + 10] = (240, 200, 180)
    return img, segmap


def test_inpaint_torso_paints_above_and_zeros_head():
    img, segmap = _synthetic_scene()
    torso_img, mask = inpaint_torso(img, segmap)
    # head pixels OUTSIDE the streak columns are zeroed
    assert torso_img[20, 21].sum() == 0
    # ... but the streaks deliberately paint up INTO the head region (that
    # region becomes visible when the head moves)
    assert torso_img[20, 30].astype(int).sum() > 100
    # torso itself kept
    np.testing.assert_array_equal(torso_img[50, 30], (200, 60, 60))
    # the band right above the neck top (head region) got streaked with
    # (darkened, possibly blurred) neck-ish colors, not zeros
    assert mask[34, 30]
    assert torso_img[34, 30].astype(int).sum() > 100
    # far-away background untouched by the mask
    assert not mask[5, 5]
    assert torso_img[5, 5].sum() == 0  # zero outside the torso mask


def test_extract_background_knn_recovers_bg():
    h = w = 48
    rs = np.random.RandomState(0)
    true_bg = rs.randint(0, 255, (h, w, 3), np.uint8)
    frames, segs = [], []
    # a person block occupying a different column range each frame; 15
    # frames so the 5-frame subsampling still sees all three positions
    for i in range(15):
        x0 = (0, 16, 32)[(i // 5) % 3]
        f = true_bg.copy()
        s = np.zeros((h, w), np.int64)
        f[:, x0 : x0 + 16] = (10, 200, 10)
        s[:, x0 : x0 + 16] = 4
        frames.append(f)
        segs.append(s)
    bg = extract_background_knn(np.stack(frames), np.stack(segs))
    # most pixels recover the true background exactly
    match = (bg == true_bg).all(-1).mean()
    assert match > 0.5, match
    # and no pixel keeps the person color
    person_colored = ((bg[..., 1] > 150) & (bg[..., 0] < 50)).mean()
    assert person_colored < 0.2


def test_prepare_source_outputs():
    img, segmap = _synthetic_scene()
    prep = prepare_source(img, segmap)
    assert prep["head_img"].shape == img.shape
    assert prep["torso_img"].shape == img.shape
    assert prep["bg_img"].shape == img.shape
    assert prep["segmap_onehot"].shape == img.shape[:2] + (6,)
    # head image keeps head pixels, zero elsewhere
    np.testing.assert_array_equal(prep["head_img"][20, 30], (240, 200, 180))
    assert prep["head_img"][50, 30].sum() == 0
    # one-hot is consistent with the class map
    assert prep["segmap_onehot"][50, 30, 4] == 1.0


def test_crop_on_face_area_enlarges_face():
    img = np.zeros((128, 128, 3), np.uint8)
    img[56:72, 56:72] = 255  # a 16x16 "face"
    lm = np.stack(np.meshgrid(np.linspace(56, 71, 8), np.linspace(56, 71, 8)),
                  -1).reshape(-1, 2)[:68]
    out = crop_on_face_area(img, lm, min_percent=0.2)
    assert out.shape == img.shape
    # the face now covers a much larger fraction of the image
    frac_before = (img > 128).any(-1).mean()
    frac_after = (out > 128).any(-1).mean()
    assert frac_after > 3 * frac_before
