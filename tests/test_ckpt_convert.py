"""Numerical parity tests for the torch->flax checkpoint converter.

Strategy (VERDICT round-1 item 3): instantiate the *reference* torch module
with random weights, convert its state_dict with ``tools/convert_torch_ckpt``,
run the same inputs through our flax module, and require the outputs to agree.
This proves the converter (and the architectural parity it depends on) without
needing the released checkpoints.

The reference repo is mounted read-only at /root/reference; these tests import
its modules as an oracle only. Skipped wholesale if it is unavailable.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference networks_stylegan2 (and friends) as an oracle."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from modules.eg3ds.models import networks_stylegan2 as ns2
    except Exception as exc:  # pragma: no cover - env without the reference
        pytest.skip(f"reference not importable: {exc}")
    return ns2


def _sd(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)


def _agree(ours, theirs, tol=1e-4, msg=""):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(theirs, np.float32),
        rtol=tol, atol=tol, err_msg=msg,
    )


# ---------------------------------------------------------------------------
# Leaf layers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("act,lr_mul,bias_init", [
    ("linear", 1.0, 0.0), ("lrelu", 0.01, 1.0),
])
def test_fully_connected_parity(ref, act, lr_mul, bias_init):
    import jax.numpy as jnp

    from real3dportrait_tpu.models import FullyConnectedLayer
    from tools.convert_torch_ckpt import convert_state_dict

    torch.manual_seed(0)
    tm = ref.FullyConnectedLayer(6, 10, activation=act,
                                 lr_multiplier=lr_mul, bias_init=bias_init)
    x = np.random.RandomState(0).randn(3, 6).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()

    fm = FullyConnectedLayer(10, activation=act, lr_multiplier=lr_mul,
                             bias_init=bias_init)
    variables = convert_state_dict(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x))
    _agree(got, want)


@pytest.mark.parametrize("up,down", [(1, 1), (2, 1), (1, 2)])
def test_conv2d_layer_parity(ref, up, down):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.stylegan2 import Conv2dLayer
    from tools.convert_torch_ckpt import convert_state_dict

    torch.manual_seed(1)
    tm = ref.Conv2dLayer(4, 7, kernel_size=3, activation="lrelu",
                         up=up, down=down, conv_clamp=256.0)
    x = np.random.RandomState(1).randn(2, 4, 8, 8).astype(np.float32)
    want = _nhwc(tm(torch.from_numpy(x)))

    fm = Conv2dLayer(7, kernel_size=3, activation="lrelu", up=up, down=down,
                     conv_clamp=256.0)
    variables = convert_state_dict(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _agree(got, want, msg=f"up={up} down={down}")


def test_mapping_network_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models import MappingNetwork
    from tools.convert_torch_ckpt import convert_state_dict

    torch.manual_seed(2)
    tm = ref.MappingNetwork(z_dim=16, c_dim=12, w_dim=24, num_ws=5, num_layers=3)
    rs = np.random.RandomState(2)
    z = rs.randn(4, 16).astype(np.float32)
    c = rs.randn(4, 12).astype(np.float32)
    # seed w_avg with something non-zero so truncation is a real test
    tm.w_avg.copy_(torch.from_numpy(rs.randn(24).astype(np.float32)))
    want = tm(torch.from_numpy(z), torch.from_numpy(c),
              truncation_psi=0.6).detach().numpy()

    fm = MappingNetwork(z_dim=16, c_dim=12, w_dim=24, num_ws=5, num_layers=3)
    variables = convert_state_dict(_sd(tm))
    got = fm.apply(variables, jnp.asarray(z), jnp.asarray(c), truncation_psi=0.6)
    _agree(got, want)


def test_synthesis_layer_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.stylegan2 import SynthesisLayer
    from tools.convert_torch_ckpt import convert_state_dict

    torch.manual_seed(3)
    tm = ref.SynthesisLayer(5, 9, w_dim=12, resolution=16, up=2,
                            conv_clamp=256.0)
    rs = np.random.RandomState(3)
    x = rs.randn(2, 5, 8, 8).astype(np.float32)
    w = rs.randn(2, 12).astype(np.float32)
    want = _nhwc(tm(torch.from_numpy(x), torch.from_numpy(w),
                    noise_mode="const", fused_modconv=False))

    fm = SynthesisLayer(9, w_dim=12, resolution=16, up=2, conv_clamp=256.0)
    variables = convert_state_dict(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   jnp.asarray(w), noise_mode="const")
    _agree(got, want)


def test_torgb_layer_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.stylegan2 import ToRGBLayer
    from tools.convert_torch_ckpt import convert_state_dict

    torch.manual_seed(4)
    tm = ref.ToRGBLayer(6, 3, w_dim=12, conv_clamp=256.0)
    rs = np.random.RandomState(4)
    x = rs.randn(2, 6, 8, 8).astype(np.float32)
    w = rs.randn(2, 12).astype(np.float32)
    want = _nhwc(tm(torch.from_numpy(x), torch.from_numpy(w), fused_modconv=False))

    fm = ToRGBLayer(3, w_dim=12, conv_clamp=256.0)
    variables = convert_state_dict(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w))
    _agree(got, want)


# ---------------------------------------------------------------------------
# Composite networks
# ---------------------------------------------------------------------------


def test_generator_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models import Generator
    from tools.convert_torch_ckpt import convert_stylegan2_generator

    torch.manual_seed(5)
    tm = ref.Generator(z_dim=16, c_dim=0, w_dim=24, img_resolution=32,
                       img_channels=3, mapping_kwargs={"num_layers": 2},
                       channel_base=1024, channel_max=64, num_fp16_res=0)
    z = np.random.RandomState(5).randn(2, 16).astype(np.float32)
    want = _nhwc(tm(torch.from_numpy(z), None, noise_mode="const"))

    fm = Generator(z_dim=16, c_dim=0, w_dim=24, img_resolution=32,
                   img_channels=3, mapping_layers=2,
                   channel_base=1024, channel_max=64, num_fp16_res=0)
    variables = convert_stylegan2_generator(_sd(tm))
    got = fm.apply(variables, jnp.asarray(z), None, noise_mode="const")
    _agree(got, want, tol=2e-4)


def test_discriminator_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models import Discriminator
    from tools.convert_torch_ckpt import convert_stylegan2_discriminator

    torch.manual_seed(6)
    tm = ref.Discriminator(c_dim=8, img_resolution=32, img_channels=3,
                           channel_base=1024, channel_max=64, num_fp16_res=0,
                           mapping_kwargs={"num_layers": 2},
                           epilogue_kwargs={"mbstd_group_size": 2})
    rs = np.random.RandomState(6)
    img = rs.randn(4, 3, 32, 32).astype(np.float32)
    c = rs.randn(4, 8).astype(np.float32)
    want = tm(torch.from_numpy(img), torch.from_numpy(c)).detach().numpy()

    fm = Discriminator(c_dim=8, img_resolution=32, img_channels=3,
                       channel_base=1024, channel_max=64, num_fp16_res=0,
                       mapping_layers=2, mbstd_group_size=2)
    variables = convert_stylegan2_discriminator(_sd(tm))
    got = fm.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                   jnp.asarray(c))
    _agree(got, want, tol=2e-4)


def test_osg_decoder_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models import OSGDecoder
    from tools.convert_torch_ckpt import convert_osg_decoder

    sys.path.insert(0, REF) if REF not in sys.path else None
    from modules.eg3ds.models.triplane import OSGDecoder as TorchOSG

    torch.manual_seed(7)
    tm = TorchOSG(20, {"decoder_lr_mul": 1.0, "decoder_output_dim": 32})
    feats = np.random.RandomState(7).randn(2, 3, 40, 20).astype(np.float32)
    want = tm(torch.from_numpy(feats), None)
    fm = OSGDecoder(hidden_dim=64, output_dim=32)
    variables = convert_osg_decoder(_sd(tm))
    got = fm.apply(variables, jnp.asarray(feats))
    _agree(got["rgb"], want["rgb"].detach().numpy())
    _agree(got["sigma"], want["sigma"].detach().numpy())


@pytest.fixture(scope="module")
def ref_segformer():
    """Import the reference segformer with shimmed timm/mmcv deps."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tests.ref_shims import install_ref_shims

    install_ref_shims()
    try:
        from modules.real3d import segformer as ref_sf
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference segformer not importable: {exc}")
    return ref_sf


def test_segformer_img2plane_backbone_parity(ref_segformer):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.segformer import SegFormerImg2PlaneBackbone
    from tests.ref_shims import patched_torch_load
    from tools.convert_torch_ckpt import convert_segformer_backbone

    torch.manual_seed(10)
    with patched_torch_load():
        tm = ref_segformer.SegFormerImg2PlaneBackbone(mode="b0").eval()
    x = np.random.RandomState(10).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # [B,3,C,H,W]

    fm = SegFormerImg2PlaneBackbone(scale="b0", plane_channels=32,
                                    head_norm_mode="folded_bn")
    variables = convert_segformer_backbone(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # ours: [B,3,H,W,C] -> torch layout [B,3,C,H,W]
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    _agree(got, want, tol=2e-4)


def test_segformer_secc2plane_backbone_parity(ref_segformer):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.segformer import SegFormerSECC2PlaneBackbone
    from tests.ref_shims import patched_torch_load
    from tools.convert_torch_ckpt import convert_segformer_backbone

    torch.manual_seed(11)
    with patched_torch_load():
        tm = ref_segformer.SegFormerSECC2PlaneBackbone(
            mode="b0", out_channels=96, pncc_cond_mode="cano_src_tgt"
        ).eval()
    x = np.random.RandomState(11).randn(1, 9, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    # reference out_channels=96 is the TOTAL across 3 planes -> 32 per plane
    fm = SegFormerSECC2PlaneBackbone(scale="b0", plane_channels=32,
                                     pncc_cond_mode="cano_src_tgt",
                                     head_norm_mode="folded_bn")
    variables = convert_segformer_backbone(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    _agree(got, want, tol=2e-4)


@pytest.fixture(scope="module")
def ref_vae():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from modules.audio2motion import vae as ref_vae_mod
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference vae not importable: {exc}")
    return ref_vae_mod


def test_pitch_contour_vae_infer_parity(ref_vae):
    """Full audio->motion inference path at temperature=0 (deterministic):
    cond stack + g_pre_net + glow reverse + WN decoder."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.models.audio2motion import PitchContourVAEModel
    from tools.convert_torch_ckpt import convert_pitch_contour_vae

    torch.manual_seed(20)
    hp = {"use_mouth_amp_embed": True, "use_eye_amp_embed": False}
    tm = ref_vae.PitchContourVAEModel(hp, in_out_dim=64, audio_in_dim=64).eval()

    rs = np.random.RandomState(20)
    b, t = 2, 32  # audio at 50Hz; motion at 25Hz
    batch_np = {
        "audio": rs.randn(b, t, 64).astype(np.float32),
        "f0": (rs.rand(b, t).astype(np.float32) * 300 + 80),
        "y_mask": np.ones((b, t // 2), np.float32),
        "blink": (rs.rand(b, t, 1) > 0.7).astype(np.int64),
        "mouth_amp": np.full((b, 1), 0.4, np.float32),
    }
    tb = {k: torch.from_numpy(v) for k, v in batch_np.items()}
    with torch.no_grad():
        want = tm(tb, ret={}, train=False, temperature=0.0).numpy()

    fm = PitchContourVAEModel(in_out_dim=64, audio_in_dim=64,
                              norm_mode="folded_bn")
    variables = convert_pitch_contour_vae(_sd(tm))
    batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}
    batch_j["blink"] = batch_j["blink"].astype(jnp.int32)
    out = fm.apply(variables, batch_j, train=False, temperature=0.0,
                   rngs={"noise": jax.random.PRNGKey(0)})
    _agree(out["pred"], want, tol=3e-4)


def test_fvae_encoder_parity(ref_vae):
    """Posterior (m, logs) of the FVAE encoder (the training-only half)."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.models.audio2motion import FVAEEncoder
    from tools.convert_torch_ckpt import convert_pitch_contour_vae

    torch.manual_seed(21)
    tm = ref_vae.FVAEEncoder(in_channels=64, hidden_channels=32,
                             latent_channels=16, kernel_size=5, n_layers=4,
                             gin_channels=24, strides=[4]).eval()
    rs = np.random.RandomState(21)
    b, t = 2, 32
    x = rs.randn(b, 64, t).astype(np.float32)       # torch BCT
    g = rs.randn(b, 24, t // 4).astype(np.float32)  # squeezed cond
    mask = np.ones((b, 1, t), np.float32)  # full-rate; strided internally
    with torch.no_grad():
        _, m_t, logs_t, _ = tm(torch.from_numpy(x), torch.from_numpy(mask),
                               torch.from_numpy(g))

    fm = FVAEEncoder(hidden_channels=32, latent_channels=16, kernel_size=5,
                     n_layers=4, gin_channels=24, strides=(4,))
    # converter renames are anchored on the full-model paths; wrap + unwrap
    converted = convert_pitch_contour_vae(
        {f"encoder.{k}": v for k, v in _sd(tm).items()}
    )
    variables = {c: t["encoder"] for c, t in converted.items()}
    _, m, logs, _ = fm.apply(
        variables, jnp.asarray(x.transpose(0, 2, 1)),
        jnp.ones((b, t, 1)), jnp.asarray(g.transpose(0, 2, 1)),
        jax.random.PRNGKey(0),
    )
    _agree(m, m_t.numpy().transpose(0, 2, 1), tol=2e-4)
    _agree(logs, logs_t.numpy().transpose(0, 2, 1), tol=2e-4)


@pytest.fixture(scope="module")
def ref_facev2v():
    """Reference facev2v networks; func_utils hard-codes .cuda(), patch it."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU oracle
    from tests.ref_shims import install_ref_shims

    install_ref_shims()  # torchvision placeholder for model(2).py imports
    try:
        from modules.real3d.facev2v_warp import network as ref_net
        from utils.commons.hparams import hparams as ref_hparams
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference facev2v not importable: {exc}")
    ref_hparams.update({
        "torso_kp_num": 4, "torso_mask_dilate_ksize": 7,
        "mul_torso_mask": True,
    })
    return ref_net


def test_syncnet_468_parity():
    """Convert a random-weight reference LandmarkHubertSyncNet in the SHIPPED
    468-landmark configuration (lm_dim = 468*3,
    `egs/os_avatar/audio_lm3d_syncnet.yaml:19` syncnet_keypoint_mode=lm468)
    and check both tower embeddings match."""
    import jax.numpy as jnp

    from real3dportrait_tpu.models.syncnet import LandmarkHubertSyncNet
    from tools.convert_torch_ckpt import convert_syncnet

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from modules.syncnet.models import (
        LandmarkHubertSyncNet as TorchSyncNet,
    )

    torch.manual_seed(60)
    lm_dim = 468 * 3
    tm = TorchSyncNet(lm_dim=lm_dim, audio_dim=1024,
                      num_layers_per_block=3, base_hid_size=128,
                      out_dim=1024).eval()
    rs = np.random.RandomState(60)
    hubert = rs.randn(2, 10, 1024).astype(np.float32)
    mouth = rs.randn(2, 5, lm_dim).astype(np.float32)
    with torch.no_grad():
        a_t, m_t = tm(torch.from_numpy(hubert), torch.from_numpy(mouth))

    fm = LandmarkHubertSyncNet(lm_dim=lm_dim, audio_dim=1024,
                               num_layers_per_block=3, base_hid_size=128,
                               out_dim=1024, norm_mode="affine")
    variables = convert_syncnet(_sd(tm))
    a_j, m_j = fm.apply(variables, jnp.asarray(hubert), jnp.asarray(mouth))
    _agree(a_j, a_t.numpy(), tol=2e-3, msg="audio embedding")
    _agree(m_j, m_t.numpy(), tol=2e-3, msg="mouth embedding")


def test_appearance_extractor_parity(ref_facev2v):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.torso import AppearanceFeatureExtractor
    from tools.convert_torch_ckpt import convert_facev2v_torso

    torch.manual_seed(30)
    tm = ref_facev2v.AppearanceFeatureExtractor("small").eval()
    x = np.random.RandomState(30).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # [N,C,D,H,W]

    fm = AppearanceFeatureExtractor(feat_channels=32, depth=16,
                                    down_seq=(64, 128, 256), n_res=6,
                                    norm_mode="affine")
    variables = convert_facev2v_torso(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # ours [B,D,H,W,C] -> torch [B,C,D,H,W]
    _agree(np.asarray(got).transpose(0, 4, 1, 2, 3), want, tol=3e-4)


def test_motion_field_estimator_parity(ref_facev2v):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.torso import MotionFieldEstimator
    from tools.convert_torch_ckpt import convert_facev2v_torso

    torch.manual_seed(31)
    tm = ref_facev2v.MotionFieldEstimator(
        "small", input_channels=34, num_keypoints=4).eval()
    rs = np.random.RandomState(31)
    fs = rs.randn(1, 34, 16, 32, 32).astype(np.float32)  # D=16 (hard-coded
    # in the reference's occlusion conv channel math)
    kp_s = (rs.rand(1, 4, 3).astype(np.float32) - 0.5) * 1.6
    kp_d = (rs.rand(1, 4, 3).astype(np.float32) - 0.5) * 1.6
    eye = torch.eye(3)[None]
    with torch.no_grad():
        def_t, occ_t, occ2_t = tm(torch.from_numpy(fs), torch.from_numpy(kp_s),
                                  torch.from_numpy(kp_d), eye, eye)

    fm = MotionFieldEstimator(num_keypoints=4, compress_channels=4,
                              down_seq=(32, 64, 128, 256, 512),
                              up_seq=(512, 256, 128, 64, 32, 16),
                              norm_mode="affine")
    variables = convert_facev2v_torso(_sd(tm))
    def_j, occ_j, occ2_j = fm.apply(
        variables, jnp.asarray(fs.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(kp_s), jnp.asarray(kp_d),
    )
    _agree(def_j, def_t.numpy(), tol=3e-4)  # both [B,D,H,W,3]
    _agree(np.asarray(occ_j).transpose(0, 3, 1, 2), occ_t.numpy(), tol=3e-4)
    _agree(np.asarray(occ2_j).transpose(0, 3, 1, 2), occ2_t.numpy(), tol=3e-4)


def test_warp_generator_parity(ref_facev2v):
    import jax.numpy as jnp

    from real3dportrait_tpu.models.torso import WarpGenerator
    from tools.convert_torch_ckpt import convert_facev2v_torso

    torch.manual_seed(32)
    tm = ref_facev2v.Generator(input_channels=32, model_scale="small").eval()
    # random spectral-normed convs have operator norm > 1 on images, so 6
    # res blocks explode activations to ~1e28 and drown the comparison in
    # amplified fp noise; inflating the stored u vectors shrinks the folded
    # weights identically on both sides (eval-mode sigma uses stored u/v).
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("weight_u"):
                buf.mul_(20.0)
    rs = np.random.RandomState(32)
    fs = rs.randn(1, 32, 16, 16, 16).astype(np.float32)
    # a mild deformation around the identity grid
    from real3dportrait_tpu.models.torso import make_coordinate_grid_3d

    grid = np.asarray(make_coordinate_grid_3d(16, 16, 16))[None]
    deformation = (grid + rs.randn(1, 16, 16, 16, 3).astype(np.float32) * 0.05
                   ).astype(np.float32)
    with torch.no_grad():
        rgb_t, hid_t = tm(torch.from_numpy(fs), torch.from_numpy(deformation),
                          occlusion=None, return_hid=True)

    fm = WarpGenerator(up_seq=(256, 128, 64), n_res=6, norm_mode="affine")
    variables = convert_facev2v_torso(_sd(tm))
    rgb_j, hid_j = fm.apply(
        variables, jnp.asarray(fs.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(deformation),
    )

    # untrained activations blow up through 6 norm-less res adds, amplifying
    # fp noise; compare on a std-normalized scale instead of raw magnitudes
    def norm_agree(ours, theirs, tol):
        scale = np.std(theirs) + 1e-12
        _agree(np.asarray(ours) / scale, theirs / scale, tol=tol)

    norm_agree(np.asarray(rgb_j).transpose(0, 3, 1, 2), rgb_t.numpy(), 2e-3)
    norm_agree(np.asarray(hid_j).transpose(0, 3, 1, 2), hid_t.numpy(), 2e-3)


def test_composite_img2plane_backbone_parity():
    """The composite (DeepLabV3-ResNet34 + dual ViT) backbone — the mode the
    released checkpoints use (`real3d_orig/img2plane_orig.yaml`)."""
    import jax.numpy as jnp

    from real3dportrait_tpu.models.img2plane_composite import (
        CompositeImg2PlaneBackbone,
    )
    from tests.ref_shims import install_ref_shims
    from tools.convert_torch_ckpt import convert_composite_backbone

    if REF not in sys.path:
        sys.path.insert(0, REF)
    install_ref_shims()
    torch.Tensor.cuda = lambda self, *a, **k: self
    from modules.img2plane.deeplabv3.decoders import my_model as ref_my_model
    from modules.img2plane.img2plane_model import Img2PlaneModel

    # avoid the imagenet weight download (zero-egress environment)
    orig_get_encoder = ref_my_model.get_encoder
    ref_my_model.get_encoder = lambda name, **kw: orig_get_encoder(
        name, **{**kw, "weights": None})
    try:
        torch.manual_seed(50)
        hp = {"img2plane_input_mode": "rgb",
              "img2plane_backbone_scale": "standard"}
        tm = Img2PlaneModel(out_channels=96, hp=hp).eval()
    finally:
        ref_my_model.get_encoder = orig_get_encoder

    x = np.random.RandomState(50).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # [B,3,C,H/2,W/2]

    fm = CompositeImg2PlaneBackbone(plane_channels=32, scale="standard",
                                    vit_dim=1024, norm_mode="affine")
    variables = convert_composite_backbone(_sd(tm))
    got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    scale = np.std(want) + 1e-12
    _agree(got / scale, want / scale, tol=2e-3)


@pytest.mark.slow
def test_sr_with_ref_warp_parity(ref_facev2v):
    """Full torso/bg-aware SR fusion head (the flagship's SR stage) with the
    shipped config: torso v2, fuse mode v2. The heaviest parity test."""
    import jax.numpy as jnp

    from real3dportrait_tpu.models.sr_with_ref import SuperresolutionHybrid8XDCWarp
    from tools.convert_torch_ckpt import convert_sr_with_ref
    from utils.commons.hparams import hparams as ref_hparams  # reference

    ref_hparams.update({
        "torso_model_version": "v2", "htbsr_head_weight_fuse_mode": "v2",
        "weight_fuse": True, "htbsr_head_threshold": 0.9,
        "torso_kp_num": 4, "torso_mask_dilate_ksize": 7,
        "mul_torso_mask": True, "torso_inp_mode": "rgb",
    })
    from modules.real3d.super_resolution.sr_with_ref import (
        SuperresolutionHybrid8XDC_Warp as TorchSRWarp,
    )

    torch.manual_seed(40)
    tm = TorchSRWarp(32, 512, 0, True).eval()
    with torch.no_grad():  # tame the spectral-normed generator (see above)
        for name, buf in tm.named_buffers():
            if name.endswith("weight_u"):
                buf.mul_(20.0)

    rs = np.random.RandomState(40)
    b = 1
    rgb = rs.randn(b, 3, 128, 128).astype(np.float32) * 0.3
    x = rs.randn(b, 32, 128, 128).astype(np.float32) * 0.3
    ws = rs.randn(b, 3, 512).astype(np.float32)
    torso_img = rs.rand(b, 3, 256, 256).astype(np.float32) * 2 - 1
    bg_img = rs.rand(b, 3, 256, 256).astype(np.float32) * 2 - 1
    weights = rs.rand(b, 1, 128, 128).astype(np.float32)
    segmap = np.zeros((b, 6, 256, 256), np.float32)
    segmap[:, 4, 120:, :] = 1.0  # torso region
    segmap[:, 2, 100:120, :] = 1.0  # neck
    kp_s = (rs.rand(b, 68, 3).astype(np.float32) - 0.5) * 1.2
    kp_d = kp_s + rs.randn(b, 68, 3).astype(np.float32) * 0.05
    with torch.no_grad():
        rgb_t, _ = tm(
            torch.from_numpy(rgb), torch.from_numpy(x), torch.from_numpy(ws),
            torch.from_numpy(torso_img), torch.from_numpy(bg_img),
            torch.from_numpy(weights), torch.from_numpy(segmap),
            torch.from_numpy(kp_s), torch.from_numpy(kp_d),
            noise_mode="const", fused_modconv=False,
        )

    fm = SuperresolutionHybrid8XDCWarp(
        sr_num_fp16_res=0, torso_version="v2", fuse_mode="v2",
        torso_norm_mode="affine", torso_kp_num=4, torso_scale="standard",
        torso_inp_mode="rgb",  # this oracle instance uses torso_inp_mode=rgb
    )
    variables = convert_sr_with_ref(_sd(tm))
    got, _ = fm.apply(
        variables, jnp.asarray(rgb.transpose(0, 2, 3, 1)),
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ws),
        jnp.asarray(torso_img.transpose(0, 2, 3, 1)),
        jnp.asarray(bg_img.transpose(0, 2, 3, 1)),
        jnp.asarray(weights.transpose(0, 2, 3, 1)),
        jnp.asarray(segmap.transpose(0, 2, 3, 1)),
        jnp.asarray(kp_s), jnp.asarray(kp_d), noise_mode="const",
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    want = rgb_t.numpy()
    scale = np.std(want) + 1e-12
    _agree(got / scale, want / scale, tol=5e-3)


@pytest.mark.slow
def test_secc2video_full_assembly(ref_facev2v):
    """Convert the ENTIRE reference flagship (OSAvatarSECC_Img2plane_Torso,
    shipped orig config) state_dict and check it drops leaf-for-leaf onto our
    flagship's variable tree (shapes via eval_shape — no compute)."""
    import os

    import jax
    import jax.numpy as jnp
    import yaml

    from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2PlaneTorso
    from tests.ref_shims import patched_torch_load
    from tools.convert_torch_ckpt import (
        convert_secc2video,
        flagship_model_kwargs,
        verify_tree,
    )
    from utils.commons.hparams import hparams as ref_hparams

    def load_chain(path):
        if not os.path.exists(path):
            return {}
        cfg = {}
        d = yaml.safe_load(open(path)) or {}
        bases = d.get("base_config", [])
        bases = bases if isinstance(bases, list) else [bases]
        for b in bases:
            bp = (os.path.normpath(os.path.join(os.path.dirname(path), b))
                  if b.startswith(".") else os.path.join(REF, b))
            cfg.update(load_chain(bp))
        cfg.update({k: v for k, v in d.items() if k != "base_config"})
        return cfg

    cfg = {}
    cfg.update(load_chain(f"{REF}/egs/egs_bases/eg3d/base.yaml"))
    cfg.update(load_chain(f"{REF}/egs/os_avatar/img2plane.yaml"))
    cfg.update(load_chain(
        f"{REF}/egs/os_avatar/real3d_orig/secc_img2plane_torso_orig.yaml"))
    ref_hparams.update(cfg)

    from modules.img2plane.deeplabv3.decoders import my_model as ref_my_model

    orig_get_encoder = ref_my_model.get_encoder
    ref_my_model.get_encoder = lambda name, **kw: orig_get_encoder(
        name, **{**kw, "weights": None})
    try:
        with patched_torch_load():
            from modules.real3d.secc_img2plane_torso import (
                OSAvatarSECC_Img2plane_Torso,
            )

            torch.manual_seed(60)
            tm = OSAvatarSECC_Img2plane_Torso()
    finally:
        ref_my_model.get_encoder = orig_get_encoder

    converted = convert_secc2video(_sd(tm), backbone_mode="composite")
    extras = converted.pop("task_extra")
    assert set(extras) == {"lambda_pertube_secc", "lambda_pertube_blink_secc"}

    fm = OSAvatarSECCImg2PlaneTorso(**flagship_model_kwargs())
    b, res = 1, 512
    f32 = jax.ShapeDtypeStruct
    cond = {
        "ref_torso_img": f32((b, res, res, 3), jnp.float32),
        "bg_img": f32((b, res, res, 3), jnp.float32),
        "segmap": f32((b, res, res, 6), jnp.float32),
        "kp_src": f32((b, 68, 3), jnp.float32),
        "kp_drv": f32((b, 68, 3), jnp.float32),
    }
    tmpl = jax.eval_shape(
        fm.init,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        f32((b, res, res, 3), jnp.float32), f32((b, 25), jnp.float32),
        cond, secc=f32((b, res, res, 9), jnp.float32),
    )
    problems = verify_tree(converted, dict(tmpl))
    assert not problems, "\n".join(problems[:40])


@pytest.mark.slow
def test_superresolution_8xdc_parity(ref):
    import jax.numpy as jnp

    from real3dportrait_tpu.models import SuperresolutionHybrid8XDC
    from tools.convert_torch_ckpt import convert_superresolution

    sys.path.insert(0, REF) if REF not in sys.path else None
    from modules.eg3ds.models.superresolution import (
        SuperresolutionHybrid8XDC as TorchSR,
    )

    torch.manual_seed(8)
    tm = TorchSR(channels=32, img_resolution=512, sr_num_fp16_res=0,
                 sr_antialias=True)
    rs = np.random.RandomState(8)
    rgb = rs.randn(1, 3, 128, 128).astype(np.float32)
    x = rs.randn(1, 32, 128, 128).astype(np.float32)
    ws = rs.randn(1, 3, 512).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(torch.from_numpy(rgb), torch.from_numpy(x),
                        torch.from_numpy(ws), noise_mode="const",
                        fused_modconv=False))

    fm = SuperresolutionHybrid8XDC(sr_num_fp16_res=0)
    variables = convert_superresolution(_sd(tm))
    got = fm.apply(variables, jnp.asarray(rgb.transpose(0, 2, 3, 1)),
                   jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ws),
                   noise_mode="const")
    _agree(got, want, tol=3e-4)


def test_vgg19_converter_parity(tmp_path):
    """Random-weight torch VGG19-features oracle -> convert -> our jax
    feature taps agree (torchvision absent: rebuild the exact topology)."""
    import jax.numpy as jnp
    import torch.nn as tnn

    from real3dportrait_tpu.models.perceptual import (
        LAYER_WEIGHTS, load_vgg19_params, vgg19_features, vgg19_perceptual,
    )
    from tools.convert_torch_ckpt import convert_vgg19, save_vgg19

    # torchvision vgg19().features topology up to relu5_1
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU()]
            in_ch = v
    torch.manual_seed(11)
    features = tnn.Sequential(*layers)
    for p_ in features.parameters():
        p_.data.normal_(0, 0.05)

    tree = convert_vgg19(features.state_dict())
    path = str(tmp_path / "vgg19.msgpack")
    save_vgg19(tree, path)
    loaded = load_vgg19_params(path)

    rng = np.random.RandomState(0)
    # in [-1,1] like the loss inputs; compare the LAST tap (deepest path)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    taps = vgg19_features(loaded, jnp.asarray(img))
    assert len(taps) == len(LAYER_WEIGHTS)

    # torch oracle: same normalization then forward, grabbing relu taps
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (torch.from_numpy(img).permute(0, 3, 1, 2) + 1) * 0.5
    x = (x - mean) / std
    tap_idx = {1, 6, 11, 20, 29}  # after relu1_1, relu2_1, ...
    got_taps = []
    with torch.no_grad():
        for i, layer in enumerate(features):
            x = layer(x)
            if i in tap_idx:
                got_taps.append(x.permute(0, 2, 3, 1).numpy())
    for ours, theirs in zip(taps, got_taps):
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=5e-3, atol=1e-3)

    # the loss itself runs off the loaded tree
    val = float(vgg19_perceptual(loaded, jnp.asarray(img), jnp.asarray(img) * 0.9))
    assert np.isfinite(val) and val > 0


@pytest.mark.slow
def test_vggface_perceptual_v2_parity(tmp_path):
    """Random-weight oracle of the SHIPPED lpips_mode=vgg19_v2 criterion
    (`facev2v_warp/losses.py:116`, PerceptualLoss = VGG19 + VGGFace +
    3-scale pyramid) vs our perceptual_v2. Oracle rebuilt in plain torch
    (torchvision absent in this image)."""
    import jax.numpy as jnp
    import torch.nn as tnn
    import torch.nn.functional as tF

    from real3dportrait_tpu.models.perceptual import perceptual_v2
    from tools.convert_torch_ckpt import convert_vgg19, convert_vggface

    def build(cfg):
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU()]
                in_ch = v
        return tnn.Sequential(*layers)

    torch.manual_seed(12)
    vgg19 = build([64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                   512, 512, 512, 512, "M", 512])
    vggface = build([64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512])
    for net in (vgg19, vggface):
        for p_ in net.parameters():
            p_.data.normal_(0, 0.03)

    rng = np.random.RandomState(3)
    # small inputs; disable the 512 resize on both sides by injecting 512?
    # use 64x64 and mirror the reference's unconditional-resize with torch
    pred = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)

    # --- torch oracle (losses.py:135-174) ---
    mean19 = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std19 = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    mean_face = torch.tensor([129.186279296875, 104.76238250732422,
                              93.59396362304688]).view(1, 3, 1, 1)
    lw = [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]
    taps19 = {1, 6, 11, 20, 29}       # relu_{1..5}_1 in vgg19 features
    taps_face = {1, 6, 11, 18, 25}    # relu_{1..5}_1 in vgg16 features

    def run(net, x, taps):
        out = []
        for i, m in enumerate(net):
            x = m(x)
            if i in taps:
                out.append(x)
        return out

    with torch.no_grad():
        x = (torch.from_numpy(pred).permute(0, 3, 1, 2) + 1) * 0.5
        y = (torch.from_numpy(tgt).permute(0, 3, 1, 2) + 1) * 0.5
        x = tF.interpolate(x, size=(512, 512), mode="bilinear",
                           antialias=True, align_corners=False)
        y = tF.interpolate(y, size=(512, 512), mode="bilinear",
                           antialias=True, align_corners=False)
        want = 0.0
        fx = run(vggface, x * 255 - mean_face, taps_face)
        fy = run(vggface, y * 255 - mean_face, taps_face)
        for w, a, b in zip(lw, fx, fy):
            want += w * (a - b).abs().mean().item() / 255
        gx = run(vgg19, (x - mean19) / std19, taps19)
        gy = run(vgg19, (y - mean19) / std19, taps19)
        for w, a, b in zip(lw, gx, gy):
            want += w * (a - b).abs().mean().item()
        xi, yi = x, y
        for _ in range(3):
            xi = tF.interpolate(xi, scale_factor=0.5, mode="bilinear",
                                align_corners=False,
                                recompute_scale_factor=True)
            yi = tF.interpolate(yi, scale_factor=0.5, mode="bilinear",
                                align_corners=False,
                                recompute_scale_factor=True)
            a = run(vgg19, (xi - mean19) / std19, taps19)[-1]
            b = run(vgg19, (yi - mean19) / std19, taps19)[-1]
            want += (a - b).abs().mean().item()

    tree19 = convert_vgg19(vgg19.state_dict())
    tree_face = convert_vggface(vggface.state_dict())
    got = float(perceptual_v2(tree19, tree_face, jnp.asarray(pred),
                              jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_lpips_vgg_converter_parity():
    """Hand-rolled torch oracle of lpips.LPIPS(net='vgg', lpips=True)
    (scaling layer -> vgg16 taps -> unit-norm -> sq diff -> lin 1x1 ->
    spatial mean -> sum) vs our lpips_vgg after conversion."""
    import jax.numpy as jnp
    import torch.nn as tnn

    from real3dportrait_tpu.models.perceptual import lpips_vgg
    from tools.convert_torch_ckpt import convert_lpips_vgg

    torch.manual_seed(13)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU()]
            in_ch = v
    vgg16 = tnn.Sequential(*layers)
    for p_ in vgg16.parameters():
        p_.data.normal_(0, 0.03)
    lin_chs = [64, 128, 256, 512, 512]
    lins = [tnn.Conv2d(c, 1, 1, bias=False) for c in lin_chs]
    for lin in lins:
        lin.weight.data.uniform_(0, 0.1)

    # package-layout state_dict: net.slice{s}.<i>.* + lin{k}.model.1.weight
    slice_of = {**{i: 1 for i in range(0, 4)}, **{i: 2 for i in range(4, 9)},
                **{i: 3 for i in range(9, 16)}, **{i: 4 for i in range(16, 23)},
                **{i: 5 for i in range(23, 30)}}
    sd = {}
    for i, m in enumerate(vgg16):
        if isinstance(m, tnn.Conv2d):
            sd[f"net.slice{slice_of[i]}.{i}.weight"] = m.weight
            sd[f"net.slice{slice_of[i]}.{i}.bias"] = m.bias
    for k, lin in enumerate(lins):
        sd[f"lin{k}.model.1.weight"] = lin.weight

    rng = np.random.RandomState(4)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    taps = {3, 8, 15, 22, 29}

    def feats(img):
        z = (torch.from_numpy(img).permute(0, 3, 1, 2) - shift) / scale
        out = []
        for i, m in enumerate(vgg16):
            z = m(z)
            if i in taps:
                out.append(z)
        return out

    with torch.no_grad():
        want = torch.zeros(2)
        for k, (a, b) in enumerate(zip(feats(x), feats(y))):
            a = a / (a.pow(2).sum(dim=1, keepdim=True) + 1e-10).sqrt()
            b = b / (b.pow(2).sum(dim=1, keepdim=True) + 1e-10).sqrt()
            want += lins[k]((a - b) ** 2).mean(dim=(1, 2, 3)) * (
                a.shape[2] * a.shape[3] / (a.shape[2] * a.shape[3]))
        want = want.numpy()

    tree = convert_lpips_vgg(sd)
    got = np.asarray(lpips_vgg(tree, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("norm_mode", ["layer", "group"])
def test_hubert_converter_parity(norm_mode):
    """Random-weight HF HubertModel oracle (tiny config, both norm families)
    -> convert -> our Flax HubertEncoder hidden states agree."""
    import jax.numpy as jnp

    transformers = pytest.importorskip("transformers")

    from real3dportrait_tpu.audio.hubert import HubertEncoder
    from tools.convert_torch_ckpt import convert_hubert

    torch.manual_seed(70)
    cfg = transformers.HubertConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256,
        conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        feat_extract_norm=norm_mode,
        do_stable_layer_norm=(norm_mode == "layer"),
        feat_proj_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_extract_activation="gelu",
        hidden_act="gelu",
        layer_norm_eps=1e-6,
    )
    tm = transformers.HubertModel(cfg).eval()

    wav = np.random.RandomState(70).randn(1, 2000).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(wav)).last_hidden_state.numpy()

    fm = HubertEncoder(
        hidden=128, layers=2, heads=2, ffn=256,
        conv_dims=(32, 32, 32), conv_kernels=(10, 3, 2),
        conv_strides=(5, 2, 2),
        feat_extract_norm=norm_mode,
        do_stable_layer_norm=(norm_mode == "layer"),
        pos_conv_kernel=16, pos_conv_groups=4,
        feat_proj_layer_norm=True,
    )
    variables = convert_hubert(tm.state_dict())
    got = np.asarray(fm.apply(variables, jnp.asarray(wav)))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.std(want) + 1e-12
    _agree(got / scale, want / scale, tol=2e-3)


@pytest.mark.slow
def test_inception_converter_parity():
    """Random-weight torchvision-layout InceptionV3 trunk (hand-rolled
    oracle with the pytorch-fid pooling patches) -> convert_inception ->
    our Flax pool features agree. Makes FID/KID a pure weight-drop."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.metrics.inception import InceptionV3Features
    from tests.ref_shims import build_torch_inception
    from tools.convert_torch_ckpt import convert_inception

    torch.manual_seed(80)
    tm = build_torch_inception().eval()
    with torch.no_grad():
        # keep eval-BN from exploding activations through 17 blocks: set
        # running stats to something realistic
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_var.fill_(4.0)

    rs = np.random.RandomState(80)
    x = rs.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    variables = convert_inception(tm.state_dict())
    got = np.asarray(jax.jit(InceptionV3Features().apply)(
        variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2048)
    scale = np.abs(want).max() + 1e-9
    _agree(got / scale, want / scale, tol=3e-3)
