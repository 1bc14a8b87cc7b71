import json

from fluidnexus_tpu.core.config import Config, dump_config, load_config, parse_cli, read_dumped_config


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.optim.p0 == 2.0
    assert cfg.optim.KNN_K == 100
    assert cfg.optim.emit_ratio_hidden == 1.32
    assert cfg.model.train_views == "0134"
    assert cfg.model.init_x_mid == 0.326


def test_reference_json_loads_unchanged():
    """The reference's shipped smoke config must apply onto our config."""
    cfg = load_config("/root/reference/FluidDynamics/configs/fluid_nexus_smoke_dynamics.json")
    assert cfg.optim.solver_iterations == 10
    assert cfg.optim.secs == 0.033
    assert cfg.optim.p0 == 1.5
    assert cfg.optim.k == 3
    assert cfg.optim.init_hidden_velocity == 100.0
    assert cfg.model.train_views == "20134"
    assert cfg.model.train_views_fake == "0134"
    assert cfg.model.refined_strength == "0d5"
    assert cfg.optim.rigid_body == "cylinder"
    assert cfg.optim.rigid_cylinder_num == [50, 80]


def test_json_overrides_cli(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"p0": 9.0}))
    cfg = parse_cli(["--p0", "5.0", "--config", str(p)])
    assert cfg.optim.p0 == 9.0  # JSON wins, reference precedence


def test_dump_roundtrip(tmp_path):
    cfg = load_config(overrides={"p0": 3.25, "duration": 7})
    path = str(tmp_path / "cfg.json")
    dump_config(cfg, path)
    back = read_dumped_config(path)
    assert back.optim.p0 == 3.25
    assert back.model.duration == 7


def test_shipped_configs_load_and_pin_values():
    """The generated minimal-override configs must keep loading against the
    mirrored defaults; pin a few load-bearing hyperparameters."""
    import glob
    import os

    from fluidnexus_tpu.core.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.json")))
    assert len(paths) >= 14, paths
    for p in paths:
        load_config(p)  # no unknown keys / coercion errors

    smoke = load_config(os.path.join(root, "smoke_dynamics.json"))
    assert smoke.optim.solver_iterations > 0
    assert smoke.optim.H > 0 and smoke.optim.p0 > 0
    bg = load_config(os.path.join(root, "smoke_background.json"))
    assert bg.model.model == "gm_background"
    assert bg.model.init_pcd_bg is True
    scalar = load_config(os.path.join(root, "scalar_dynamics.json"))
    assert scalar.model.gray_image or scalar.model.loader in ("colmap", "scalar_real")


def test_detect_anomaly_flag():
    """--detect_anomaly parity (helper_parser.py:24,46): top-level flag,
    default off, settable from CLI and JSON."""
    from fluidnexus_tpu.core.config import parse_cli

    assert parse_cli([]).detect_anomaly is False
    assert parse_cli(["--detect_anomaly"]).detect_anomaly is True
