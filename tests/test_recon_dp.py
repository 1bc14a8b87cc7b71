"""Camera data-parallel reconstruction steps (pipe.dp) — exact parity with
the single-device steps on the 8-virtual-CPU mesh.

The reference FluidDynamics stage is strictly single-GPU
(train_physical_particle.py:45); camera-DP is the SPMD improvement SURVEY
§2.6 names. These tests pin the invariant that makes it safe to use: the
sharded step computes the SAME loss and the SAME updated positions as the
unsharded step (weighted-sum grads + psum are associative re-orderings only).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.core.optim import adam_init
from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig
from fluidnexus_tpu.parallel.mesh import make_mesh
from fluidnexus_tpu.pipelines.train_physical_particle import (
    _cam_tensors, _gts, _select_batch, make_current_frame_step, make_first_frame_step,
    pbf_params_from_config,
)
from fluidnexus_tpu.sim.state import make_particle_state, make_visual_state
from fluidnexus_tpu.splat.dynamics import constant_visual_attrs

W, H = 32, 24


def _cams(n, with_images=True):
    cams = []
    for i in range(n):
        ang = (i - (n - 1) / 2) * 0.35
        ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        R = ry @ np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
        center = np.array([0.3, 0.1, -0.3]) + ry @ np.array([0.0, 0.0, 2.0])
        T = -R.T @ center
        img = np.zeros((H, W, 3), np.float32)
        img[4 + i:14 + i, 10:20] = 0.5 + 0.04 * i
        cams.append(Camera(uid=i, R=R, T=T, fovx=0.7, fovy=0.55, width=W, height=H,
                           image=img if with_images else None, time_idx=0))
    return cams


def _raster_cfg():
    return RasterizerConfig(tile_capacity=64, chunk=16, dup_x=3, dup_y=3, backend="xla")


def _states(cfg):
    rng = np.random.default_rng(0)
    params = pbf_params_from_config(cfg)
    hidden = rng.uniform(-0.2, 0.5, (96, 3)).astype(np.float32) + np.array(
        [0.3, 0.1, -0.3], np.float32)
    state = make_particle_state(128, jnp.asarray(hidden * params.scale_factor),
                                init_velocity_y=10.0)
    visual = make_visual_state(128, jnp.asarray(
        (hidden + rng.normal(0, 0.01, hidden.shape)).astype(np.float32) * params.scale_factor))
    attrs = constant_visual_attrs(128, channels=1)
    return params, state, visual, attrs


def _cfg():
    cfg = Config()
    o = cfg.optim
    o.H = 2.0
    o.lambda_exyz = 0.1
    o.lambda_gas_constraints = 0.5
    o.lambda_next_gas_constraints = 0.1
    o.lambda_current_distance = 0.01
    o.lambda_first_distance = 0.01
    return cfg


def test_phase_c_step_dp_matches_single():
    cfg = _cfg()
    params, state, visual, attrs = _states(cfg)
    o = cfg.optim
    cams = _cams(4)
    cviews, cprojs, cfovs = _cam_tensors(cams)
    gts = _gts(cams, 3)
    rc = _raster_cfg()

    nn0 = state.estimate_xyz / params.scale_factor
    lr = jnp.float32(1e-3)
    w = jnp.ones(4, jnp.float32)
    inv_w = jnp.float32(0.25)

    step1 = make_current_frame_step(None, rc, W, H, params, o, 3, mesh=None)
    mesh = make_mesh(n_devices=4, dp=4, tp=1, time=1)
    step4 = make_current_frame_step(None, rc, W, H, params, o, 3, mesh=mesh)

    args = lambda: (nn0.copy(), adam_init({"nn": nn0}), state, visual, attrs,  # noqa: E731
                    (cviews, cprojs, cfovs), gts, lr, w, inv_w)
    nn1, _, loss1, aux1 = step1(*args())
    nn4, _, loss4, aux4 = step4(*args())

    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nn1), np.asarray(nn4), atol=1e-6)
    for k in aux1:
        np.testing.assert_allclose(float(aux1[k]), float(aux4[k]), rtol=1e-5)


def test_phase_c_step_dp_padded_batch():
    """Batch of 3 real cameras padded to 4 shards: padding slot carries w=0
    and must not perturb the result."""
    cfg = _cfg()
    params, state, visual, attrs = _states(cfg)
    o = cfg.optim
    cams = _cams(3)
    cviews, cprojs, cfovs = _cam_tensors(cams)
    gts = _gts(cams, 3)
    rc = _raster_cfg()

    nn0 = state.estimate_xyz / params.scale_factor
    lr = jnp.float32(1e-3)

    step1 = make_current_frame_step(None, rc, W, H, params, o, 3, mesh=None)
    mesh = make_mesh(n_devices=4, dp=4, tp=1, time=1)
    step4 = make_current_frame_step(None, rc, W, H, params, o, 3, mesh=mesh)

    w3 = jnp.ones(3, jnp.float32)
    nn1, _, loss1, _ = step1(nn0.copy(), adam_init({"nn": nn0}), state, visual, attrs,
                             (cviews, cprojs, cfovs), gts, lr, w3, jnp.float32(1 / 3))

    rng = np.random.default_rng(1)
    sel, w, inv_w = _select_batch(rng, 3, 3, 4)
    assert sel.shape[0] == 4 and float(w.sum()) == 3.0
    order = np.argsort(sel[:3])  # undo rng permutation for the unpadded ref
    nn1b, _, loss1b, _ = step1(nn0.copy(), adam_init({"nn": nn0}), state, visual, attrs,
                               (cviews[sel[order]], cprojs[sel[order]], cfovs[sel[order]]),
                               gts[sel[order]], lr, w3, jnp.float32(1 / 3))
    np.testing.assert_allclose(float(loss1), float(loss1b), rtol=1e-6)

    nn4, _, loss4, _ = step4(nn0.copy(), adam_init({"nn": nn0}), state, visual, attrs,
                             (cviews[sel], cprojs[sel], cfovs[sel]), gts[sel], lr, w, inv_w)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nn1), np.asarray(nn4), atol=1e-6)


def test_phase_a_step_dp_matches_single():
    cfg = _cfg()
    params, state, visual, attrs = _states(cfg)
    o = cfg.optim
    cams = _cams(4)
    cviews, cprojs, cfovs = _cam_tensors(cams)
    gts = _gts(cams, 3)
    rc = _raster_cfg()

    vxyz0 = visual.xyz / params.scale_factor  # world-space for phase A
    lr = jnp.float32(1e-3)
    w = jnp.ones(4, jnp.float32)
    inv_w = jnp.float32(0.25)

    mk = lambda mesh: make_first_frame_step(  # noqa: E731
        None, rc, W, H, o.lambda_dssim, o.lambda_first_distance,
        o.distance_threshold_visual, 3, mesh=mesh)
    step1 = mk(None)
    step4 = mk(make_mesh(n_devices=4, dp=4, tp=1, time=1))

    x1, _, loss1, l11 = step1(vxyz0.copy(), visual.alive, attrs, adam_init({"xyz": vxyz0}),
                              (cviews, cprojs, cfovs), gts, lr, w, inv_w)
    x4, _, loss4, l14 = step4(vxyz0.copy(), visual.alive, attrs, adam_init({"xyz": vxyz0}),
                              (cviews, cprojs, cfovs), gts, lr, w, inv_w)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    np.testing.assert_allclose(float(l11), float(l14), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x4), atol=1e-6)


@pytest.mark.slow
def test_train_physical_dp_pipeline():
    """Full tiny pipeline with pipe.dp=2 runs end-to-end and stays finite."""
    from tests.test_train_physical import smoke_like_scene
    from fluidnexus_tpu.pipelines.train_physical_particle import train

    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.hidden_capacity = 4096
    m.init_hidden_radius_max = 0.03
    m.visual_capacity = 2048
    m.init_visual_num_pts = 100
    m.init_thick_visual_num_pts = 30
    o.iterations_per_time_first = 4
    o.iterations_per_time_current = 3
    o.iterations_per_time_current_max = 3
    o.stable_iterations = 1
    o.solver_iterations = 2
    o.secs = 0.033
    o.alpha = 0.0
    o.p0 = 1.5
    o.k = 3.0
    o.H = 2.0
    o.init_hidden_velocity = 100.0
    o.emit_ratio_hidden = 1.0
    o.emit_ratio_visual = 1.0
    o.batch = 2
    cfg.pipe.tile_capacity = 64
    cfg.pipe.chunk = 16
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3
    cfg.pipe.dp = 2

    result = train(cfg, scene_info=smoke_like_scene(), log=lambda *a: None)
    assert len(result["metrics"]) == 2
    assert all(np.isfinite(mm["loss"]) for mm in result["metrics"])
