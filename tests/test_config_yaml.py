"""The reference's CogVideoX SAT YAMLs must load into native configs
(VERDICT #39: 5B shapes were code defaults; reference YAMLs now load)."""
import os

import pytest

from fluidnexus_tpu.diffusion.video.config_yaml import (
    deep_merge,
    load_cogvideox_yaml,
)

REF = "/root/reference/CogVideoX/configs"


def test_deep_merge_order():
    a = {"x": {"y": 1, "z": 2}, "k": [1]}
    b = {"x": {"y": 9}, "k": [2, 3]}
    m = deep_merge(a, b)
    assert m == {"x": {"y": 9, "z": 2}, "k": [2, 3]}
    assert a == {"x": {"y": 1, "z": 2}, "k": [1]}  # inputs untouched


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_reference_5b_lora_prefixi2v_loads():
    cfg = load_cogvideox_yaml([
        os.path.join(REF, "cogvideox_5b_lora_prefixi2v.yaml"),
        os.path.join(REF, "sft_pi2v_fluid_nexus_smoke.yaml"),
    ])
    d = cfg.dit
    # network_config params (cogvideox_5b_lora_prefixi2v.yaml:28-47)
    assert (d.hidden_size, d.num_layers, d.num_heads) == (3072, 42, 48)
    assert (d.in_channels, d.out_channels, d.patch_size) == (16, 16, 2)
    assert (d.latent_height, d.latent_width) == (60, 90)
    assert d.time_embed_dim == 512
    assert d.text_hidden_size == 4096 and d.text_length == 226
    # data section wins over the rope-skip num_frames hack: 49 -> 13 latents
    assert d.latent_frames == 13
    assert d.lora_rank == 128 and cfg.lora_rank == 128
    assert d.remat is True and d.ln_affine is True

    # VAE + latent scale (first_stage_config / model.scale_factor)
    assert cfg.vae.z_channels == 16 and cfg.vae.ch == 128
    assert cfg.vae.ch_mult == (1, 2, 2, 4) and cfg.vae.num_res_blocks == 3
    assert cfg.scale_factor == pytest.approx(0.7)

    # sampler: DPM++ 50 steps, DynamicCFG scale 6 exp 5 (yaml :145-163)
    assert cfg.sampler.num_steps == 50
    assert cfg.sampler.guider == "DynamicCFG"
    assert (cfg.sampler.scale, cfg.sampler.exp) == (6.0, 5.0)
    g = cfg.sampler.make_guider()
    assert g(1.0, 2.0, 0) == pytest.approx(2.0)  # ramp starts at scale 1: uc + 1*(c-uc)

    # prefix-i2v loss + conditioner
    assert cfg.fixed_frames == 3
    assert cfg.ucg_rate == pytest.approx(0.1)
    assert "t5" in cfg.t5_dir.lower()

    # train recipe (sft yaml args/deepspeed)
    t = cfg.train
    assert t.train_iters == 10000 and t.micro_batch == 2 and t.grad_accum == 1
    assert t.lr == pytest.approx(1e-3) and t.betas == (0.9, 0.95)
    assert t.weight_decay == pytest.approx(1e-4) and t.grad_clip == pytest.approx(0.1)
    assert t.zero_stage == 2 and t.bf16 is True
    assert t.video_size == (480, 720) and t.max_num_frames == 49
    assert t.cam_str == "all" and t.paths_post == "20"
    assert t.experiment_name.startswith("lora_cogvidx5b")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_all_reference_yaml_pairs_load():
    base = os.path.join(REF, "cogvideox_5b_lora_prefixi2v.yaml")
    for sft in ("sft_pi2v_fluid_nexus_ball.yaml", "sft_pi2v_scalar_flow.yaml"):
        cfg = load_cogvideox_yaml([base, os.path.join(REF, sft)])
        assert cfg.dit.hidden_size == 3072
        assert cfg.train.train_data  # every sft names its dataset


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_train_video_base_flag_sets_defaults():
    """--base YAMLs become argparse defaults; explicit CLI flags still win."""
    from fluidnexus_tpu.pipelines.train_video import apply_base_yaml, build_argparser

    argv = ["--base",
            os.path.join(REF, "cogvideox_5b_lora_prefixi2v.yaml"),
            os.path.join(REF, "sft_pi2v_fluid_nexus_smoke.yaml"),
            "--data_root", "/tmp/clips", "--lr", "5e-4"]
    args = apply_base_yaml(build_argparser(), argv)
    assert args.iterations == 10000 and args.batch == 2
    assert args.lr == pytest.approx(5e-4)       # CLI beats YAML
    assert args.fixed_frames == 3 and args.lora_rank == 128
    assert (args.height, args.width, args.num_frames) == (480, 720, 49)
    assert args.data_root == "/tmp/clips"       # CLI beats YAML train_data
    assert args.run_cfg is not None and args.run_cfg.sampler.guider == "DynamicCFG"


def test_inline_yaml_and_overrides(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(
        "model:\n"
        "  scale_factor: 1.5\n"
        "  network_config:\n"
        "    params:\n"
        "      hidden_size: 64\n"
        "      num_layers: 2\n"
        "      num_attention_heads: 4\n"
        "      num_frames: 9\n"
        "      time_compressed_rate: 4\n"
        "args:\n"
        "  train_iters: 7\n"
    )
    cfg = load_cogvideox_yaml([str(p)], overrides={"args": {"train_iters": 3}})
    assert cfg.dit.hidden_size == 64 and cfg.dit.num_layers == 2
    assert cfg.dit.latent_frames == 3  # (9-1)//4+1
    assert cfg.scale_factor == pytest.approx(1.5)
    assert cfg.train.train_iters == 3  # override wins
