import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.config import FrozenConfig, load_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_GAN = {
    "batch_size": 2,
    "final_resolution": 32,
    "neural_rendering_resolution": 8,
    "triplane_hid_dim": 8,
    "triplane_depth": 2,
    "num_samples_coarse": 6,
    "num_samples_fine": 6,
    "sr_channel0": 16,
    "sr_channel1": 8,
    "base_channel": 256,
    "max_channel": 32,
    "num_fp16_layers_in_discriminator": 0,
    "num_fp16_layers_in_super_resolution": 0,
    "group_size_for_mini_batch_std": 2,
    "reg_interval_g": 2,
    "reg_interval_d": 2,
    "reg_interval_g_cond": 2,
    "update_src2src_interval": 2,
    # pertube losses on tiny random planes sit well below these targets, so
    # use tiny targets to force the adaptive lambdas to move in the test
    "target_pertube_secc_loss": 1e-6,
    "target_pertube_blink_secc_loss": 1e-6,
    "start_adv_iters": 0,
    "stop_update_i2p_iters": 100,
    # zero the reference's param-group warmup gates so the tiny test
    # exercises updates from step 0
    "group_warmup_iters": 0,
    "start_update_sr_iters": 0,
    "mesh_shape": {"data": -1},
}


def _leaves_finite(tree):
    return all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))


def test_schedulers():
    from real3dportrait_tpu.training.schedulers import (
        build_schedule, cosine_schedule, exponential_schedule, rsqrt_schedule,
    )

    exp = exponential_schedule(1.0, 0.5, 10)
    np.testing.assert_allclose(float(exp(0)), 1.0)
    np.testing.assert_allclose(float(exp(10)), 0.5, rtol=1e-5)
    cos = cosine_schedule(1.0, 100, warmup=10)
    assert float(cos(5)) == pytest.approx(0.5, rel=1e-3)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-5)
    sched = build_schedule(FrozenConfig({"lr": 2.0, "scheduler": "exponential"}))
    assert float(sched(0)) == 2.0


def test_losses_analytic():
    from real3dportrait_tpu.training import losses as L

    x = jnp.ones((2, 4, 4, 3))
    assert float(L.masked_mse(x, x)) == 0.0
    assert float(L.masked_l1(x, x + 1)) == 1.0
    # quantile clamp bounds outliers
    y = x.at[0, 0, 0, 0].add(100.0)
    assert float(L.masked_l1(y, x, clamp_quantile=0.9)) < 1.0
    # linear sequence has zero laplacian
    seq = jnp.tile(jnp.arange(8.0)[None, :, None], (2, 1, 3))
    assert float(L.temporal_laplacian(seq)) < 1e-10
    # KL annealing ramps and cycles
    w0 = float(L.kl_annealing_weight(0, 1.0, 10, 10))
    w10 = float(L.kl_annealing_weight(10, 1.0, 10, 10))
    w20 = float(L.kl_annealing_weight(20, 1.0, 10, 10))
    assert w0 == 0.0 and w10 == 1.0 and w20 == 0.0
    # entropy is 0 at binary alphas, max at 0.5
    assert float(L.weights_entropy_loss(jnp.full((1, 2, 2, 1), 0.5))) == pytest.approx(1.0)
    assert float(L.weights_entropy_loss(jnp.zeros((1, 2, 2, 1)))) < 1e-3


def test_checkpoint_roundtrip_and_retention(tmp_path):
    from real3dportrait_tpu.training import checkpoint as ckpt

    state = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int32(5)}
    for step in [100, 200, 300, 400]:
        ckpt.save_checkpoint(str(tmp_path), step, state, num_keep=2,
                             milestone_interval=200)
    names = sorted(os.path.basename(p) for p in ckpt.get_all_ckpts(str(tmp_path)))
    # keep 2 newest (300, 400) + milestone 200; 100 pruned
    assert names == ["model_ckpt_steps_200.ckpt", "model_ckpt_steps_300.ckpt",
                     "model_ckpt_steps_400.ckpt"]
    loaded, path = ckpt.get_last_checkpoint(str(tmp_path))
    assert path.endswith("400.ckpt")
    np.testing.assert_array_equal(loaded["params"]["a"], state["params"]["a"])


def test_partial_load_shape_skip():
    from real3dportrait_tpu.training.checkpoint import partial_load

    target = {"m": {"w": np.zeros((2, 2)), "b": np.zeros((3,))}, "x": np.zeros(1)}
    source = {"m": {"w": np.ones((2, 2)), "b": np.ones((4,))}}
    out, stats = partial_load(target, source)
    np.testing.assert_array_equal(out["m"]["w"], 1.0)
    np.testing.assert_array_equal(out["m"]["b"], 0.0)
    assert stats == {"loaded": 1, "shape_mismatch": 1, "missing": 1}


def test_mesh_and_sharding():
    from real3dportrait_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh({"data": -1})
    assert mesh.devices.size == 8
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec[0] == "data"
    mesh2 = make_mesh({"data": -1, "rays": 2})
    assert mesh2.shape == {"data": 4, "rays": 2}


@pytest.mark.slow
def test_syncnet_task_steps():
    from real3dportrait_tpu.training.tasks.syncnet_task import SyncNetTask

    cfg = FrozenConfig({"batch_size": 4, "syncnet_base_hid_size": 16,
                        "syncnet_out_hid_size": 32, "lr": 1e-3})
    task = SyncNetTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   task.synthetic_batch(np.random.RandomState(0)))
    step = jax.jit(task.train_step)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    assert int(state.step) == 2
    assert _leaves_finite(metrics)
    val = task.val_step(state, batch, jax.random.PRNGKey(9))
    assert "val_loss" in val


@pytest.mark.slow
def test_audio2motion_task_losses_decrease():
    from real3dportrait_tpu.training.tasks.audio2motion_task import Audio2MotionTask

    cfg = FrozenConfig({"batch_size": 2, "sample_min_length": 16, "lr": 1e-3,
                        "scheduler": "none", "clip_grad_norm": 1.0})
    task = Audio2MotionTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   task.synthetic_batch(np.random.RandomState(0)))
    step = jax.jit(task.train_step)
    first = None
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        if first is None:
            first = float(metrics["mse_exp"])
    assert _leaves_finite(metrics)
    assert float(metrics["mse_exp"]) < first  # same-batch overfit sanity


@pytest.mark.slow
def test_secc_img2plane_task_step():
    from real3dportrait_tpu.training.tasks.secc_img2plane_task import SeccImg2PlaneTask

    cfg = FrozenConfig(TINY_GAN)
    task = SeccImg2PlaneTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   task.synthetic_batch(np.random.RandomState(0)))
    step = jax.jit(task.train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    assert _leaves_finite(metrics)
    assert "g/mse" in metrics and "d/loss" in metrics and "g/adv" in metrics
    assert "g/lip_mae" in metrics and "g/lip_percep" in metrics
    assert "g/pertube_blink_secc" in metrics
    # adaptive lambdas moved off their init on the cond-reg step
    # (step 2 == reg_interval_g_cond, loss above the tiny target)
    assert float(state.extra["lambda_pertube_secc"]) != 0.0
    assert float(state.extra["lambda_pertube_blink_secc"]) != 0.0
    val = jax.jit(task.val_step)(state, batch, jax.random.PRNGKey(2))
    assert "val_psnr" in val
    # validation visual regression (`secc_img2plane_task.py:672-741`):
    # per-sample strips + depth pairs + the fixed OOD probe
    images = task.val_images(state, batch, jax.random.PRNGKey(3), max_samples=1)
    assert "ref_mv_reconraw_predraw_recon_pred_00000" in images
    assert "depth_recon_pred_00000" in images
    assert "ood_probe" in images
    strip = images["ref_mv_reconraw_predraw_recon_pred_00000"]
    assert strip.dtype == np.uint8 and strip.shape == (32, 32 * 8, 3)
    assert images["ood_probe"].shape == (32, 32, 3)
    # the probe is cached and fixed across validations
    assert task.ood_probe_batch() is task.ood_probe_batch()


def test_secc_task_grad_gates():
    from real3dportrait_tpu.training.tasks.secc_img2plane_task import SeccImg2PlaneTask

    cfg = FrozenConfig({**TINY_GAN, "start_adv_iters": 5, "stop_update_i2p_iters": 3,
                        "two_stage_training": True})
    task = SeccImg2PlaneTask(cfg)
    # cano group ramps linearly toward lr_mul over start_adv+20000 steps
    # (`secc_img2plane_task.py:58`)
    gates1 = task._grad_gates(jnp.asarray(1))
    assert float(gates1["img2plane_backbone"]) == pytest.approx(1.0 / 20005)
    gates4 = task._grad_gates(jnp.asarray(4))
    assert float(gates4["img2plane_backbone"]) == 0.0  # past stop_i2p
    assert float(gates4["secc_img2plane_backbone"]) == 1.0
    gates6 = task._grad_gates(jnp.asarray(6))  # stage 2: only SR
    assert float(gates6["secc_img2plane_backbone"]) == 0.0
    assert float(gates6["superresolution"]) == 1.0


@pytest.mark.slow
def test_torso_task_step():
    from real3dportrait_tpu.training.tasks.secc_img2plane_torso_task import (
        SeccImg2PlaneTorsoTask,
    )

    cfg = FrozenConfig({**TINY_GAN, "torso_model_scale": "tiny", "batch_size": 1})
    task = SeccImg2PlaneTorsoTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   task.synthetic_batch(np.random.RandomState(0)))
    before = state.params["gen"]["img2plane_backbone"]
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(0))
    assert _leaves_finite(metrics)
    # frozen head: img2plane params unchanged
    after = state.params["gen"]["img2plane_backbone"]
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    # SR/torso params did change
    d_sr = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["gen"]["superresolution"],
        task.build(jax.random.PRNGKey(0)).params["gen"]["superresolution"],
    )
    assert max(jax.tree_util.tree_leaves(d_sr)) > 0.0


@pytest.mark.slow
def test_img2plane_distillation_step():
    from real3dportrait_tpu.training.tasks.img2plane_task import Img2PlaneTask

    cfg = FrozenConfig({**TINY_GAN, "z_dim": 16, "w_dim": 16,
                        "teacher_plane_resolution": 16, "start_adv_iters": 0})
    task = Img2PlaneTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   task.synthetic_batch(np.random.RandomState(0)))
    teacher_before = jax.tree_util.tree_leaves(state.params["teacher"])[0].copy()
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(0))
    assert _leaves_finite(metrics)
    assert "g/mse_mv" in metrics
    # teacher stays frozen
    teacher_after = jax.tree_util.tree_leaves(state.params["teacher"])[0]
    np.testing.assert_array_equal(np.asarray(teacher_before), np.asarray(teacher_after))


@pytest.mark.slow
def test_trainer_loop_smoke(tmp_path):
    from real3dportrait_tpu.training.tasks.syncnet_task import SyncNetTask
    from real3dportrait_tpu.training.trainer import Trainer

    cfg = FrozenConfig({
        "batch_size": 4, "syncnet_base_hid_size": 16, "syncnet_out_hid_size": 32,
        "lr": 1e-3, "max_updates": 6, "val_check_interval": 3,
        "num_sanity_val_steps": 1, "eval_max_batches": 1, "tb_log_interval": 2,
        "mesh_shape": {"data": -1}, "seed": 0,
    })
    task = SyncNetTask(cfg)
    trainer = Trainer(cfg, task, work_dir=str(tmp_path))
    state = trainer.fit()
    assert int(jax.device_get(state.step)) == 6
    assert os.path.isfile(os.path.join(tmp_path, "config.yaml"))
    assert os.path.isfile(os.path.join(tmp_path, "metrics.jsonl"))
    from real3dportrait_tpu.training.checkpoint import get_all_ckpts

    assert len(get_all_ckpts(str(tmp_path))) >= 1
    # resume: a fresh trainer restores the step counter
    trainer2 = Trainer(cfg.replace(max_updates=8), task, work_dir=str(tmp_path))
    state2 = trainer2.fit()
    assert int(jax.device_get(state2.step)) == 8


@pytest.mark.slow
def test_eg3d_task_step():
    from real3dportrait_tpu.training.tasks.eg3d_task import EG3DTask

    cfg = FrozenConfig({**TINY_GAN, "z_dim": 16, "w_dim": 16,
                        "teacher_plane_resolution": 16, "gpc_reg_prob": 0.5,
                        "ema_interval": 10})
    task = EG3DTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   task.synthetic_batch(np.random.RandomState(0)))
    step = jax.jit(task.train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    assert _leaves_finite(metrics)
    assert "g/adv" in metrics and "d/r1" in metrics
    # EMA tracks but lags the generator
    g0 = jax.tree_util.tree_leaves(state.params["gen"])[0]
    e0 = jax.tree_util.tree_leaves(state.params["gen_ema"])[0]
    assert float(jnp.abs(g0 - e0).max()) > 0


@pytest.mark.slow
def test_curriculum_partial_restore(tmp_path):
    """Stage chaining: a torso task initializes its head modules from a
    secc_img2plane checkpoint via init_from_ckpt (the reference's
    load_ckpt curriculum, secc_img2plane_torso_task.py:64-76)."""
    import jax

    from flax import serialization

    from real3dportrait_tpu.training import checkpoint as ckpt
    from real3dportrait_tpu.training.tasks.secc_img2plane_task import SeccImg2PlaneTask
    from real3dportrait_tpu.training.tasks.secc_img2plane_torso_task import (
        SeccImg2PlaneTorsoTask,
    )
    from real3dportrait_tpu.training.trainer import Trainer

    cfg = FrozenConfig({**TINY_GAN, "batch_size": 1, "torso_model_scale": "tiny"})
    head_task = SeccImg2PlaneTask(cfg)
    head_state = head_task.build(jax.random.PRNGKey(7))
    head_dir = str(tmp_path / "secc_head")
    ckpt.save_checkpoint(head_dir, 5, serialization.to_state_dict(head_state))

    torso_cfg = cfg.replace(init_from_ckpt=head_dir, max_updates=0,
                            num_sanity_val_steps=0)
    torso_task = SeccImg2PlaneTorsoTask(torso_cfg)
    trainer = Trainer(torso_cfg, torso_task, work_dir=str(tmp_path / "torso"))
    state = trainer.init_or_restore(jax.random.PRNGKey(0))

    # head submodules (matching shapes) copied from the secc checkpoint
    src = head_state.params["gen"]["secc_img2plane_backbone"]
    dst = state.params["gen"]["secc_img2plane_backbone"]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()), src, dst
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_parallel_map():
    from real3dportrait_tpu.preprocess.parallel_map import iter_parallel, parallel_map

    out = parallel_map(lambda x: x * x, range(10), num_workers=3, use_threads=True)
    assert out == [i * i for i in range(10)]
    pairs = dict(iter_parallel(lambda x: -x, range(5), num_workers=2))
    assert pairs == {i: -i for i in range(5)}


@pytest.mark.slow
def test_trainer_dumps_val_images(tmp_path):
    """Trainer writes task-provided validation images as PNGs under
    work_dir/val_images/iter<step>/ each validation."""
    from real3dportrait_tpu.training.tasks.syncnet_task import SyncNetTask
    from real3dportrait_tpu.training.trainer import Trainer

    class ImgTask(SyncNetTask):
        def val_images(self, state, batch, rng):
            return {"probe": np.full((8, 8, 3), 128, np.uint8)}

    cfg = FrozenConfig({
        "batch_size": 2, "syncnet_base_hid_size": 8, "syncnet_out_hid_size": 16,
        "lr": 1e-3, "max_updates": 2, "val_check_interval": 2,
        "num_sanity_val_steps": 0, "eval_max_batches": 1, "tb_log_interval": 2,
        "mesh_shape": {"data": -1}, "seed": 0,
    })
    task = ImgTask(cfg)
    trainer = Trainer(cfg, task, work_dir=str(tmp_path))
    trainer.fit()
    assert os.path.isfile(os.path.join(tmp_path, "val_images", "iter2",
                                       "probe.png"))


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
def test_grad_accumulation_syncnet():
    """accumulate_grad_batches=k: params move only every k-th micro-step and
    the k-step update matches the mean-gradient update (optax.MultiSteps)."""
    from real3dportrait_tpu.config import FrozenConfig
    from real3dportrait_tpu.training.tasks.syncnet_task import SyncNetTask

    cfg = FrozenConfig({"batch_size": 2, "accumulate_grad_batches": 2,
                        "syncnet_num_layers_per_block": 1,
                        "syncnet_base_hid_size": 8,
                        "syncnet_out_hid_size": 16})
    task = SyncNetTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    batch = task.synthetic_batch(np.random.RandomState(0))
    step = jax.jit(task.train_step)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    # micro-step 1 of 2: no parameter movement yet
    assert np.allclose(jax.tree_util.tree_leaves(state.params)[0], p0)
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    # micro-step 2: the accumulated update applies
    assert not np.allclose(jax.tree_util.tree_leaves(state.params)[0], p0)


def test_trainer_tee_and_code_snapshot(tmp_path):
    """Run provenance: terminal log tee + source snapshot
    (`utils/commons/trainer.py:44-59,658-674`)."""
    import glob
    import sys

    from real3dportrait_tpu.training.tasks.syncnet_task import SyncNetTask
    from real3dportrait_tpu.training.trainer import Trainer

    cfg = FrozenConfig({
        "batch_size": 2, "syncnet_base_hid_size": 8, "syncnet_out_hid_size": 16,
        "lr": 1e-3, "max_updates": 1, "val_check_interval": 5,
        "num_sanity_val_steps": 0, "eval_max_batches": 1, "tb_log_interval": 1,
        "mesh_shape": {"data": -1}, "seed": 0,
    })
    out, err = sys.stdout, sys.stderr
    try:
        trainer = Trainer(cfg, SyncNetTask(cfg), work_dir=str(tmp_path))
        trainer.fit()
        print("tee-me")
    finally:
        sys.stdout, sys.stderr = out, err
    logs = glob.glob(os.path.join(tmp_path, "terminal_logs", "log_*.txt"))
    assert logs and "tee-me" in open(logs[0]).read()
    snaps = glob.glob(os.path.join(
        tmp_path, "codes", "*", "real3dportrait_tpu", "training", "trainer.py"))
    assert snaps


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
def test_ray_cp_sharded_render_matches_unsharded():
    """The real render path (trigrid sampling + OSGDecoder + importance
    resampling) under shard_map over rays == unsharded render, including the
    cross-shard pmin/pmax ray-limit fallback (SURVEY §5 'written ray-sharded
    from day one')."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from real3dportrait_tpu.geometry import (
        fov_to_intrinsics, lookat_pose, pack_camera,
    )
    from real3dportrait_tpu.geometry.camera import unpack_camera
    from real3dportrait_tpu.models.decoder import OSGDecoder
    from real3dportrait_tpu.parallel import make_mesh
    from real3dportrait_tpu.rendering import (
        RenderOptions, render_rays, sample_rays,
    )

    mesh = make_mesh({"rays": -1})
    planes = jax.random.normal(jax.random.PRNGKey(0),
                               (1, 3, 1, 32, 32, 32)) * 0.1
    dec = OSGDecoder(hidden_dim=64, output_dim=32)
    dv = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 8, 32)), None)
    cam = pack_camera(
        lookat_pose(jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1, 3))),
        fov_to_intrinsics(),
    )
    c2w, intr = unpack_camera(cam)
    origins, dirs = sample_rays(c2w, intr, 16)  # 256 rays / 8 devices
    opts = RenderOptions(depth_resolution=6, depth_resolution_importance=6)

    def shard_fn(dv, planes, o, d):
        decoder = lambda f, dd: dec.apply(dv, f, dd)
        return render_rays(planes, decoder, o, d, opts, axis_name="rays")["rgb"]

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, "rays", None), P(None, "rays", None)),
        out_specs=P(None, "rays", None), check_rep=False,
    )
    rgb_sharded = jax.jit(sharded)(dv, planes, origins, dirs)
    decoder = lambda f, dd: dec.apply(dv, f, dd)
    rgb_ref = render_rays(planes, decoder, origins, dirs, opts)["rgb"]
    assert float(jnp.max(jnp.abs(rgb_sharded - rgb_ref))) < 1e-5


@pytest.mark.slow  # 2x4-process GAN-step dryrun; ~7 min cold / ~3 warm
def test_dryrun_multihost_two_process():
    """Gate the multi-host run path (VERDICT r4 #5): two OS processes with 4
    forced CPU devices each run one distributed GAN step whose loss must
    match the single-process 8-device run (tools/dryrun_multihost.py; the
    shared persistent compile cache keeps repeat runs in budget).

    Reference match: multi-machine DDP (`utils/commons/trainer.py:579-610`).
    """
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=1500, cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun multihost(2x4): 1 GAN step ok" in proc.stdout, proc.stdout
