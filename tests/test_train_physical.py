import os

import numpy as np
import pytest

from fluidnexus_tpu.core.config import Config
from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.data.readers import SceneInfo
from fluidnexus_tpu.pipelines.train_physical_particle import train


def smoke_like_scene(n_frames=3, n_cams=3, width=32, height=24):
    """Tiny synthetic multi-view video of a bright blob around the smoke
    column location (x_mid 0.326, z_mid -0.3)."""
    cams = []
    uid = 0
    for t in range(n_frames):
        for i in range(n_cams):
            ang = (i - 1) * 0.5
            ry = np.array(
                [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
            )
            R = ry @ np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
            center = np.array([0.326, 0.1, -0.3]) + ry @ np.array([0.0, 0.0, 2.0])
            T = -R.T @ center
            img = np.zeros((height, width, 3), np.float32)
            img[6 + t : 16 + t, 12:20] = 0.6  # blob drifts upward over time
            cams.append(
                Camera(uid=uid, R=R, T=T, fovx=0.7, fovy=0.55, width=width, height=height,
                       image=img, image_real=img, image_name=f"train0{i}", time_idx=t)
            )
            uid += 1
    return SceneInfo(point_cloud=None, train_cameras=cams, test_cameras=[],
                     nerf_normalization={"radius": 2.0, "translate": np.zeros(3)})


@pytest.mark.slow
def test_train_physical_end_to_end(tmp_path):
    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.model_path = str(tmp_path)
    m.hidden_capacity = 8192
    m.init_hidden_radius_max = 0.03  # keep the init pillar small for test speed
    m.visual_capacity = 4096
    m.init_visual_num_pts = 200
    m.init_thick_visual_num_pts = 50
    o.iterations_per_time_first = 8
    o.iterations_per_time_current = 5
    o.iterations_per_time_current_max = 5
    o.stable_iterations = 2
    o.solver_iterations = 3
    o.secs = 0.033
    o.alpha = 0.0
    o.p0 = 1.5
    o.k = 3.0
    o.H = 2.0
    o.init_hidden_velocity = 100.0
    o.emit_ratio_hidden = 1.0
    o.emit_ratio_visual = 1.0
    o.batch = 1
    o.lambda_first_distance = 0.0
    o.lambda_current_distance = 0.0
    o.lambda_exyz = 0.1
    o.lambda_gas_constraints = 1.0
    o.lambda_next_gas_constraints = 0.1
    cfg.pipe.tile_capacity = 64
    cfg.pipe.chunk = 16
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3

    scene = smoke_like_scene()
    result = train(cfg, scene_info=scene, log=lambda *a: None)

    metrics = result["metrics"]
    assert len(metrics) == 2  # frames 1..2
    assert all(np.isfinite(mm["loss"]) for mm in metrics)
    assert all(mm["hidden"] > 0 and mm["visual"] > 0 for mm in metrics)
    # emission adds particles over time
    assert metrics[-1]["hidden"] >= metrics[0]["hidden"]

    # checkpoint format parity: per-frame npy files
    ckpt = os.path.join(str(tmp_path), "checkpoint")
    for t in range(3):
        for name in ("xyz", "estimate_xyz", "velocity", "imass", "counts",
                     "particle_id", "visual_xyz", "visual_color"):
            assert os.path.exists(os.path.join(ckpt, f"frame_{t:03d}_{name}.npy")), name
        assert os.path.exists(os.path.join(ckpt, f"frame_{t:03d}_scalar_values.json"))

    # positions stay finite and particles stay roughly in the scene
    xyz = np.load(os.path.join(ckpt, "frame_002_xyz.npy"))
    assert np.isfinite(xyz).all()
    assert np.abs(xyz).max() < 50.0


def test_checkpoint_roundtrip(tmp_path):
    from fluidnexus_tpu.sim.pbf import PBFParams
    from fluidnexus_tpu.sim.state import make_particle_state
    from fluidnexus_tpu.splat.dynamics import load_hidden, save_hidden
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    st = make_particle_state(64, jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32) * 10))
    st = st._replace(velocity=st.velocity.at[:40].set(jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)))
    p = PBFParams()
    save_hidden(st, p, str(tmp_path), 5)
    back = load_hidden(str(tmp_path), 5, 64, p)
    np.testing.assert_allclose(np.asarray(back.xyz)[:40], np.asarray(st.xyz)[:40], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(back.velocity)[:40], np.asarray(st.velocity)[:40], rtol=1e-5)
    assert int(back.num_alive) == 40
    assert int(back.next_id) == 40
