"""Shipped gen presets pin the reference configs_gen/*.yaml values."""
import pytest


REF_PINS = {
    # task, strength, window_frames, frame_step, zero123 step, tgt view
    "refine_smoke": ("refine", 0.5, 65, 2, 52000, 1),
    "refine_ball": ("refine", 0.5, 65, 2, 88000, 4),
    "refine_scalar": ("refine", 0.5, 65, 1, 15500, 4),
    "future_smoke": ("future", 0.75, 73, 2, 52000, 4),
    "future_ball": ("future", 0.75, 73, 2, 88000, 4),
    "future_scalar": ("future", 0.55, 65, 1, 15500, 4),
    "wind_smoke": ("future", 0.55, 65, 2, 52000, 4),
}


@pytest.mark.parametrize("name", sorted(REF_PINS))
def test_preset_reference_pins(name):
    from fluidnexus_tpu.core.gen_presets import load_gen_preset

    p = load_gen_preset(name)
    task, strength, wf, step, z123, tgt = REF_PINS[name]
    assert p["task"] == task
    assert p["strength"] == strength
    assert p["window_frames"] == wf
    assert p["frame_step"] == step
    assert p["zero123_finetune_step"] == z123
    assert p["tgt_view_idx"] == tgt
    assert p["prefix_frames"] == 9
    # window length must land on the causal VAE's 4k+1 grid and agree with
    # the reference's sampling_num_frames (latent frame count)
    assert (wf - 1) // 4 + 1 == p["sampling_latent_frames"]


def test_refine_window_starts():
    """Per-window body/label starts (sdedit_[label_]start_idx_one/two/three)."""
    from fluidnexus_tpu.core.gen_presets import load_gen_preset

    starts = {
        "refine_smoke": ([55, 167, 279], [37, 149, 261], 37),
        "refine_ball": ([33, 145, 257], [15, 127, 239], 15),
        "refine_scalar": ([20, 76, 131], [11, 67, 113], 11),
    }
    for name, (body, label, gt0) in starts.items():
        p = load_gen_preset(name)
        assert p["window_start_indices"] == body
        assert p["label_start_indices"] == label
        assert p["gt_prefix_start"] == gt0


def test_preset_applies_as_defaults_cli_overrides():
    import argparse

    from fluidnexus_tpu.core.gen_presets import (
        apply_preset_defaults, load_gen_preset)

    ap = argparse.ArgumentParser()
    ap.add_argument("--strength", type=float, default=0.5)
    ap.add_argument("--window_frames", type=int, default=49)
    ap.add_argument("--gen_future_since", type=int, default=90)
    apply_preset_defaults(ap, load_gen_preset("future_smoke"))
    args = ap.parse_args([])
    assert args.strength == 0.75 and args.window_frames == 73
    assert args.gen_future_since == 120
    # explicit flag wins over the preset
    args = ap.parse_args(["--strength", "0.9"])
    assert args.strength == 0.9


def test_unknown_preset_lists_available():
    from fluidnexus_tpu.core.gen_presets import load_gen_preset

    with pytest.raises(FileNotFoundError) as e:
        load_gen_preset("nope")
    assert "refine_smoke" in str(e.value)
