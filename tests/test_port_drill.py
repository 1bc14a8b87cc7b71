"""Port drill CLI: a real (tiny, SAT-layout) torch checkpoint file flows
load -> port -> graft -> forward -> save and round-trips through
core.checkpoint. Complements the per-map oracle tests (test_port_*.py) by
exercising the FILE-level plumbing a user's real checkpoint would hit."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig  # noqa: E402
from tests.test_port_video_dit import make_state_dict  # noqa: E402

CFG = VideoDiTConfig(hidden_size=64, num_layers=2, num_heads=4,
                     text_hidden_size=32, text_length=4, latent_frames=3,
                     latent_height=16, latent_width=16, in_channels=16,
                     out_channels=16, dtype=jnp.float32, ln_affine=True,
                     time_embed_dim=None)


def test_drill_cogvideox_from_file(tmp_path, capsys):
    from fluidnexus_tpu.core.checkpoint import load_params
    from fluidnexus_tpu.pipelines.port_drill import drill_cogvideox

    sd = make_state_dict(CFG, np.random.default_rng(0))
    ckpt = tmp_path / "mp_rank_00_model_states.pt"
    # SAT checkpoint wrapper layout: {"module": {k: tensor}}
    torch.save({"module": {k: torch.tensor(v) for k, v in sd.items()}}, ckpt)

    params = drill_cogvideox(str(ckpt), out_dir=str(tmp_path / "out"),
                             dit_cfg=CFG)
    out = capsys.readouterr().out
    assert "video.dit" in out and "forward checksum" in out
    # the printed checksum is finite and nonzero (weights actually flowed)
    chk = float(out.split("forward checksum")[1].split()[0])
    assert np.isfinite(chk) and chk > 0

    reloaded = load_params(str(tmp_path / "out" / "video_dit"))
    import jax

    a = jax.tree.leaves(params)
    b = jax.tree.leaves(reloaded)
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_drill_requires_some_input():
    from fluidnexus_tpu.pipelines.port_drill import main

    with pytest.raises(SystemExit):
        main([])
