"""5B LoRA step-time roofline (VERDICT r3 item 6).

Breaks the single-chip int8-base LoRA train step (TPU_TESTS r3: 58.2 s/step)
into measured stages and compares each against the v5e analytic roofline:

  1. fwd loss only          — 1x forward FLOPs
  2. value_and_grad         — fwd + remat recompute + bwd
  3. full LoRA train step   — (2) + AdamW over the 264M LoRA params

and prints the analytic FLOP budget (dense matmuls from the actual int8
kernel shapes + the S^2 attention term at seq 17776) with achieved TFLOP/s /
MXU utilization per stage. With --trace, captures a jax.profiler device
trace of ONE pre-compiled step and prints the top ops via xplane_summary,
so the gap decomposes into named kernels (flash-attention fwd/bwd custom
calls vs dequant-matmul fusions vs everything else).

Matches the reference finetune recipe it benchmarks against:
CogVideoX/configs/sft_pi2v_fluid_nexus_smoke.yaml (LoRA r=128,
checkpoint_activations, micro-bs per GPU) on 4-8 80GiB A100s.

Run (TPU, ~all compiles served from .jax_cache after the first time):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_5b_roofline.py \
        [--trace] [--iters 2]
"""
import argparse
import functools
import os
import sys
import time

V5E_BF16_TFLOPS = 197.0   # MXU peak, one v5e chip
V5E_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="capture + summarize a device trace of one step")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--trace_dir", default="/tmp/trace_5b")
    ap.add_argument("--stage", choices=["fwd", "grad", "step", "all"],
                    default="step",
                    help="ONE stage per process: each compiled 5B executable "
                    "plus its buffers is several GiB of HBM, and keeping "
                    "fwd+grad+step resident at once OOMs the 16 GiB chip "
                    "(measured). 'all' accepts that risk.")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.engine import (
        VideoEngine, lora_merge, lora_partition)

    cfg = VideoDiTConfig(dtype=jnp.bfloat16, lora_rank=128, remat=True,
                         remat_group=6, base_quant=True)
    eng = VideoEngine(cfg, fixed_frames=3)
    model = VideoDiT(cfg)

    lat = jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                     cfg.latent_height, cfg.latent_width), jnp.bfloat16)
    txt = jnp.zeros((1, cfg.text_length, cfg.text_hidden_size), jnp.bfloat16)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat,
                            jnp.array([500], jnp.int32), txt)["params"]

    # ---- analytic FLOP budget from the actual parameter shapes ----
    seq = (cfg.latent_frames * (cfg.latent_height // cfg.patch_size)
           * (cfg.latent_width // cfg.patch_size) + cfg.text_length)
    dense_p = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes)
                  if s.dtype == jnp.int8 or (s.ndim == 2 and s.shape[0] > 64))
    f_dense = 2.0 * seq * dense_p                      # fwd matmul FLOPs
    f_attn = 4.0 * seq * seq * cfg.hidden_size * cfg.num_layers
    f_fwd = f_dense + f_attn
    # nested remat (outer group scope + inner per-block) recomputes the fwd
    # twice during bwd; bwd itself is 2x fwd -> step ~ 5x fwd FLOPs
    f_step = 5.0 * f_fwd
    print(f"seq {seq}, dense params {dense_p/1e9:.2f}B")
    print(f"analytic fwd:  dense {f_dense/1e12:.1f} + attn {f_attn/1e12:.1f} "
          f"= {f_fwd/1e12:.1f} TFLOP -> ideal {f_fwd/V5E_BF16_TFLOPS/1e12:.2f} s")
    print(f"analytic step: {f_step/1e12:.1f} TFLOP (fwd + 2x remat recompute "
          f"+ 2x bwd) -> ideal {f_step/V5E_BF16_TFLOPS/1e12:.2f} s")
    # int8 dequant traffic: read int8 + write bf16 per weight use, ~5 uses
    dq_gb = dense_p * (1 + 2) * 5 / 1e9
    print(f"int8 dequant traffic bound: ~{dq_gb:.0f} GB -> "
          f"{dq_gb/V5E_HBM_GBPS:.1f} s if spilled to HBM each use\n")

    @jax.jit
    def make_params():
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    params = make_params()
    jax.block_until_ready(params)
    lp0, bp = lora_partition(params)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(lp0)

    def timed(name, fn, *a, flops=None, iters=None):
        out = fn(*a)                      # compile + warm
        jax.block_until_ready(out)
        n = iters or args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        extra = ""
        if flops:
            tf = flops / dt / 1e12
            extra = f"  {tf:.1f} TFLOP/s = {tf/V5E_BF16_TFLOPS*100:.0f}% MXU"
        print(f"{name:28s} {dt:8.2f} s{extra}", flush=True)
        return dt, out

    rng = jax.random.PRNGKey(1)

    @jax.jit
    def fwd_loss(lp, base, latents, text, k):
        return eng.loss_fn(lora_merge(lp, base), latents, text, k,
                           is_i2v=True)[0]

    @jax.jit
    def grad_only(lp, base, latents, text, k):
        return jax.value_and_grad(
            lambda q: eng.loss_fn(lora_merge(q, base), latents, text, k,
                                  is_i2v=True)[0])(lp)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def lora_step(lp, s, base, latents, text, k):
        loss, grads = jax.value_and_grad(
            lambda q: eng.loss_fn(lora_merge(q, base), latents, text, k,
                                  is_i2v=True)[0])(lp)
        updates, s = opt.update(grads, s, lp)
        return optax.apply_updates(lp, updates), s, loss

    if args.stage in ("fwd", "all"):
        timed("fwd loss", fwd_loss, lp0, bp, lat, txt, rng, flops=f_fwd)
    if args.stage in ("grad", "all"):
        timed("value_and_grad", grad_only, lp0, bp, lat, txt, rng,
              flops=f_step)
    if args.stage not in ("step", "all"):
        return

    # full step donates lp/opt and CHAINS the returned trees (no copies:
    # +3 GiB of duplicated lora/opt buffers OOMs next to the 14.2 GiB step)
    lp, s = lp0, opt_state
    lp, s, loss = lora_step(lp, s, bp, lat, txt, rng)     # compile + warm
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        lp, s, loss = lora_step(lp, s, bp, lat, txt, rng)
    jax.block_until_ready(loss)
    t_step = (time.perf_counter() - t0) / args.iters
    tf = f_step / t_step / 1e12
    print(f"{'full LoRA train step':28s} {t_step:8.2f} s  "
          f"{tf:.1f} TFLOP/s = {tf/V5E_BF16_TFLOPS*100:.0f}% MXU")

    if args.trace:
        import shutil

        shutil.rmtree(args.trace_dir, ignore_errors=True)
        with jax.profiler.trace(args.trace_dir):
            lp, s, loss = lora_step(lp, s, bp, lat, txt, rng)
            jax.block_until_ready(loss)
        import glob

        sys.path.insert(0, os.path.join(repo, "tools"))
        from xplane_summary import summarize

        for pb in glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                            recursive=True):
            summarize(pb, top=35)


if __name__ == "__main__":
    main()
