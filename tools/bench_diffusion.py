"""Diffusion-stage bench lines (driver contract helpers, VERDICT r4 item 5).

Each ``--stage`` runs in its OWN process (a compiled 5B executable plus its
buffers is several GiB of HBM — two resident at once OOM the 16 GiB chip,
measured in tools/bench_5b_roofline.py) and prints ONE JSON line that
bench.py forwards:

- zero123:   DDIM novel-view synthesis throughput at the reference inference
  operating point (256x256, 50 DDIM steps, CFG 3.0 => 100 UNet fwd per view;
  infer_fluid_nexus_smoke.py:32,53 runs 410 frames x 4 cams of these).
  Baseline 0.75 views/s ~ an A100 running the reference's SD-class UNet
  50-step CFG DDIM at 256^2 in ~1.3 s/view (no published number —
  BASELINE.md; ballpark from the reference stage's single-GPU recipe).
- 5b_step:   int8-base LoRA r=128 train step at the reference finetune shape
  (bs 1, 13x60x90 latents, seq 17776; sft_pi2v_fluid_nexus_smoke.yaml runs
  micro-bs 2 over 8xA100). Baseline 1/15 steps/s ~ a single A100 at bs 1
  with activation checkpointing (~1.4 PFLOP/step at 30-40% MXU).
- 5b_sample: one sampler step (CFG batch-2 joint DiT forward + DPM++ update
  — the unit the 50-step x 3-window gen pipeline repeats;
  gen_refine_pi2v_long.py:169-232). Baseline 0.2 steps/s ~ a single A100
  fitting the ~0.7 PFLOP CFG pair at ~45% MXU (the reference's offload
  ping-pong is slower still).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_diffusion.py --stage zero123
"""
import argparse
import json
import os
import sys
import time


def _timeit(fn, iters, warm=1):
    import jax

    for _ in range(warm):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_zero123(iters: int):
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.diffusion.ldm.model import NovelViewModel

    model = NovelViewModel()
    params = model.init_params(jax.random.PRNGKey(0), image_size=256)
    cond = jnp.zeros((1, 256, 256, 3), jnp.float32)
    delta = jnp.zeros((1, 4), jnp.float32)

    sample = jax.jit(lambda p, c, d, k: model.ddim_sample(
        p, c, d, k, num_steps=50, cfg_scale=3.0, image_size=256))
    k = jax.random.PRNGKey(1)
    dt = _timeit(lambda: sample(params, cond, delta, k), iters)
    vps = 1.0 / dt
    print(json.dumps({
        "metric": "zero123_novel_views_per_sec",
        "value": round(vps, 4),
        "unit": ("views/s (50-step DDIM, CFG 3.0 = 100 UNet fwd + VAE decode, "
                 "256x256, 1 chip; reference stage volume is 410x4 views)"),
        "vs_baseline": round(vps / 0.75, 4),
    }))


def bench_5b_step(iters: int):
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.engine import (VideoEngine, lora_merge,
                                                       lora_partition)

    cfg = VideoDiTConfig(dtype=jnp.bfloat16, lora_rank=128, remat=True,
                         remat_group=6, base_quant=True)
    eng = VideoEngine(cfg, fixed_frames=3)
    model = VideoDiT(cfg)
    lat = jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                     cfg.latent_height, cfg.latent_width), jnp.bfloat16)
    txt = jnp.zeros((1, cfg.text_length, cfg.text_hidden_size), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat,
                            jnp.array([500], jnp.int32), txt)["params"]

    @jax.jit
    def make_params():
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    params = make_params()
    jax.block_until_ready(params)
    lp, bp = lora_partition(params)
    opt = optax.adamw(1e-3)
    s = opt.init(lp)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def lora_step(lp, s, base, latents, text, k):
        loss, grads = jax.value_and_grad(
            lambda q: eng.loss_fn(lora_merge(q, base), latents, text, k,
                                  is_i2v=True)[0])(lp)
        updates, s = opt.update(grads, s, lp)
        return optax.apply_updates(lp, updates), s, loss

    k = jax.random.PRNGKey(1)
    lp, s, loss = lora_step(lp, s, bp, lat, txt, k)     # compile + warm
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        lp, s, loss = lora_step(lp, s, bp, lat, txt, k)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    sps = 1.0 / dt
    print(json.dumps({
        "metric": "video_5b_lora_train_steps_per_sec",
        "value": round(sps, 5),
        "unit": (f"steps/s ({dt:.1f} s/step: 5B int8-base LoRA r=128, bs 1, "
                 "13x16x60x90 latents, seq 17776, 1 chip)"),
        "vs_baseline": round(sps / (1.0 / 15.0), 4),
    }))


def bench_5b_sample(iters: int):
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.engine import VideoEngine
    from fluidnexus_tpu.diffusion.video.sampling import (DynamicCFG, VDenoiser,
                                                         _denoise_cfg,
                                                         zero_snr_alphas_sqrt)

    cfg = VideoDiTConfig(dtype=jnp.bfloat16, lora_rank=128, remat=False,
                         base_quant=True)
    eng = VideoEngine(cfg, fixed_frames=3)
    model = VideoDiT(cfg)
    lat = jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                     cfg.latent_height, cfg.latent_width), jnp.bfloat16)
    txt = jnp.zeros((1, cfg.text_length, cfg.text_hidden_size), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat,
                            jnp.array([500], jnp.int32), txt)["params"]

    @jax.jit
    def make_params():
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    params = make_params()
    jax.block_until_ready(params)
    alphas, t_ids = zero_snr_alphas_sqrt(50, eng.num_timesteps)
    guider = DynamicCFG(scale=6.0, exp=5.0, num_steps=50)
    den = VDenoiser(lambda xx, t, c: eng.dit_apply(params, xx, t, c))

    @jax.jit
    def one_step(x, cond, uc):
        return _denoise_cfg(den, guider, x, float(alphas[25]),
                            int(t_ids[25]), cond, uc, 25)

    x = jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                   cfg.latent_height, cfg.latent_width), jnp.float32)
    dt = _timeit(lambda: one_step(x, txt, txt), iters)
    sps = 1.0 / dt
    print(json.dumps({
        "metric": "video_5b_sampler_steps_per_sec",
        "value": round(sps, 5),
        "unit": (f"steps/s ({dt:.1f} s/step: CFG batch-2 joint 5B DiT fwd + "
                 "DynamicCFG, 13x16x60x90 latents, 1 chip; gen runs 50 x 3 "
                 "windows of these per camera)"),
        "vs_baseline": round(sps / 0.2, 4),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["zero123", "5b_step", "5b_sample"],
                    required=True)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    {"zero123": bench_zero123, "5b_step": bench_5b_step,
     "5b_sample": bench_5b_sample}[args.stage](args.iters)


if __name__ == "__main__":
    main()
