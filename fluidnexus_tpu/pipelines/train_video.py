"""LoRA finetuning of the video diffusion model (prefix-i2v).

Parity target: CogVideoX/train_image_to_video.py (training_main wiring
:173-231) + configs/sft_pi2v_*.yaml (LoRA r=128, micro-batch 2, bf16,
ZeRO-2, 10k iters, lr 1e-3) + data_video.py SFTDataset:368 (49 frames,
480x720, (x-127.5)/127.5, caption per clip).

TPU redesign: one jitted train step over a (data x model) mesh — batch
sharded over 'data', the DiT's matmuls shardable over 'model', optimizer
state ZeRO-sharded along 'data' (mesh.zero_shard_opt_state). The reference's
mp-group batch/noise broadcasts are unnecessary under SPMD.

Dataset: real mp4s + caption txts load via data/video_dataset.SFTVideoDataset
(OpenCV decode — no external ffmpeg; fps resample to 49@8fps + 4k+1 snap,
data_video.py:368-494 parity); frame-folder layouts still work
(ClipFolderDataset). make_video_dataset() picks by directory content.
"""
from __future__ import annotations

import functools

import argparse
import dataclasses
import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fluidnexus_tpu.core.checkpoint import load_params, save_params
from fluidnexus_tpu.diffusion.video.conditioner import apply_ucg, make_text_encoder
from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig
from fluidnexus_tpu.diffusion.video.engine import (
    VideoEngine, freeze_non_lora, lora_merge, lora_partition)
from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig
from fluidnexus_tpu.parallel.mesh import make_mesh, zero_shard_opt_state


# datasets live in data/video_dataset.py; re-exported for back-compat
from fluidnexus_tpu.data.video_dataset import (  # noqa: E402,F401
    ClipFolderDataset, SFTVideoDataset, make_video_dataset)


def _has_float_block_kernels(params) -> bool:
    """True when a block matmul still holds a float `kernel` (i.e. the tree
    predates quantize_dit_params)."""
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        names = [str(getattr(p, "key", p)) for p in path]
        if "kernel" in names and any(n.startswith("block_") for n in names):
            return True
    return False


def _flat_save(path, step, rng, opt_state, ema):
    """Optimizer/EMA/rng/step sidecar for full training resume (the SAT
    checkpoints the reference resumes from carry optimizer state too).
    Trees are saved as flattened leaves; restore rebuilds them into the
    treedef of a freshly-initialized state (robust to optax namedtuples)."""
    flat = {"step": np.asarray(step), "rng_key": np.asarray(rng)}
    for name, tree in (("o", opt_state), ("e", () if ema is None else ema)):
        for i, leaf in enumerate(jax.tree.leaves(tree)):
            flat[f"{name}_{i}"] = np.asarray(leaf)
    np.savez(path, **flat)


def _flat_load(path, opt_state, ema, log=print):
    z = np.load(path)

    def unflat(name, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(z[f"{name}_{i}"]) for i in range(len(leaves))])

    step = int(z["step"])
    rng = jnp.asarray(z["rng_key"])
    if ema is not None and "e_0" not in z.files:
        # checkpoint was saved with --ema_decay 0: signal the caller to seed
        # a fresh EMA from the RESUMED params (None here)
        log("resume: checkpoint has no EMA state (saved with ema_decay=0); "
            "seeding a fresh EMA from the resumed params")
        return step, rng, unflat("o", opt_state), None
    return step, rng, unflat("o", opt_state), (unflat("e", ema) if ema is not None else None)


def train(args, log=print):
    import math

    if args.quant_base and args.lora_rank <= 0:
        raise SystemExit(
            "--quant_base requires --lora_rank > 0: the int8 base is frozen "
            "by construction (jax.grad rejects int8 leaves on the "
            "full-finetune path); quantized training is LoRA-only, like the "
            "reference 5B finetune recipe")
    n = jax.device_count()
    dp = math.gcd(args.batch, n // args.tp)  # batch must divide over 'data'
    mesh = make_mesh(dp * args.tp, dp=dp, tp=args.tp)
    lat_t = (args.num_frames - 1) // 4 + 1

    run_cfg = getattr(args, "run_cfg", None)
    if args.tiny:
        dit_cfg = VideoDiTConfig(hidden_size=64, num_layers=2, num_heads=4,
                                 text_hidden_size=64, text_length=8, latent_frames=lat_t,
                                 latent_height=args.height // 8, latent_width=args.width // 8,
                                 dtype=jnp.float32, lora_rank=args.lora_rank)
        vae_cfg = VAE3DConfig(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
        txt_hidden = 64
    elif run_cfg is not None:
        # model/vae shapes come from the merged reference YAMLs; latent dims
        # follow the (possibly CLI-overridden) clip geometry
        dit_cfg = dataclasses.replace(
            run_cfg.dit, latent_frames=lat_t, latent_height=args.height // 8,
            latent_width=args.width // 8, lora_rank=args.lora_rank)
        vae_cfg = run_cfg.vae
        txt_hidden = dit_cfg.text_hidden_size
    else:
        dit_cfg = VideoDiTConfig(latent_frames=lat_t, latent_height=args.height // 8,
                                 latent_width=args.width // 8, lora_rank=args.lora_rank)
        vae_cfg = VAE3DConfig()
        txt_hidden = dit_cfg.text_hidden_size

    if args.quant_base:
        dit_cfg = dataclasses.replace(dit_cfg, base_quant=True)
    engine = VideoEngine(dit_cfg, vae_cfg, fixed_frames=args.fixed_frames)
    if args.dit_ckpt:
        params = load_params(args.dit_ckpt)
        if args.quant_base and _has_float_block_kernels(params):
            # a float checkpoint was loaded into the int8 config: convert it
            from fluidnexus_tpu.diffusion.video.dit import quantize_dit_params

            params = quantize_dit_params(params)
        # checkpoints are plain trees — re-box into the init's logical-axis
        # metadata (an eval_shape template, no 5B-sized init allocation) so
        # the TP/ZeRO layout machinery keeps working
        from fluidnexus_tpu.core.checkpoint import rebox_like

        template = jax.eval_shape(lambda: engine.init_params(jax.random.PRNGKey(0)))
        params = rebox_like(template, params)
    else:
        # fresh init under base_quant already creates int8 kernel_q + scales
        params = engine.init_params(jax.random.PRNGKey(0))
    vae_params = load_params(args.vae_ckpt) if args.vae_ckpt else engine.init_vae_params(
        jax.random.PRNGKey(1), frames=5, height=args.height, width=args.width)
    params = jax.device_put(params, NamedSharding(mesh, P()))

    if run_cfg is not None:
        t = run_cfg.train
        opt = optax.chain(
            optax.clip_by_global_norm(t.grad_clip),
            optax.adamw(args.lr, b1=t.betas[0], b2=t.betas[1], eps=t.eps,
                        weight_decay=t.weight_decay))
    else:
        opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    enc = make_text_encoder(args.t5_dir or None, max_length=dit_cfg.text_length,
                            hidden=txt_hidden,
                            allow_fake=args.allow_fake_conditioning or args.tiny)
    ds = make_video_dataset(args.data_root, args.num_frames, args.height, args.width)
    rng_np = np.random.default_rng(args.seed)

    # EMA shadow of the TRAINABLE subtree (FusedEmaAdam parity — the
    # reference optimizer keeps an EMA of the LoRA weights and its shipped
    # checkpoints sample from it; sft_pi2v_*.yaml optimizer block). decay=0
    # disables; ema_update is a no-op then and the shadow stays None.
    decay = args.ema_decay

    def ema_update(ema, new):
        return jax.tree_util.tree_map(
            lambda e, p: e * decay + (1.0 - decay) * p, ema, new)

    if args.lora_rank > 0:
        # partitioned LoRA step: grad runs over ONLY the lora subtree, so
        # base-param cotangents (10.4 GiB at 5B) are never materialized and
        # the optimizer holds moments for trainables only (the reference's
        # FusedEmaAdam over disable_untrainable_params survivors)
        lora_p0, _ = lora_partition(params)
        opt_state = zero_shard_opt_state(opt.init(lora_p0), mesh)
        ema_params = jax.tree_util.tree_map(jnp.copy, lora_p0) if decay > 0 else None

        # base params are an ARGUMENT, not a closure: closed-over trees get
        # baked into the graph as constants, which XLA stages into a second
        # on-device copy (10.4 GiB at 5B)
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def lora_step(lp, s, ema, bp, latents, txt, rng):
            loss, grads = jax.value_and_grad(
                lambda q: engine.loss_fn(lora_merge(q, bp), latents, txt,
                                         rng, is_i2v=not args.t2v)[0])(lp)
            updates, s = opt.update(grads, s, lp)
            lp = optax.apply_updates(lp, updates)
            if ema is not None:
                ema = ema_update(ema, lp)
            return lp, s, ema, loss

        def train_step(p, s, ema, latents, txt, rng):
            lp, bp = lora_partition(p)
            lp, s, ema, loss = lora_step(lp, s, ema, bp, latents, txt, rng)
            return lora_merge(lp, bp), s, ema, loss

        def ema_full_tree(p, ema):
            _, bp = lora_partition(p)
            return lora_merge(ema, bp)
    else:
        opt_state = zero_shard_opt_state(opt.init(params), mesh)
        ema_params = jax.tree_util.tree_map(jnp.copy, params) if decay > 0 else None

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(p, s, ema, latents, txt, rng):
            loss, grads = jax.value_and_grad(
                lambda q: engine.loss_fn(q, latents, txt, rng, is_i2v=not args.t2v)[0])(p)
            grads = freeze_non_lora(grads)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            if ema is not None:
                ema = ema_update(ema, p)
            return p, s, ema, loss

        def ema_full_tree(p, ema):
            return ema

    if getattr(args, "encode_chunk", 0) > 0:
        # chunked_encode manages its own per-chunk jits + donated caches; an
        # outer jit would inline them into one whole-clip graph and defeat
        # the memory chunking
        encode = lambda vp, f, k: engine.encode_first_stage(vp, f, k, chunk=args.encode_chunk)
    else:
        encode = jax.jit(lambda vp, f, k: engine.encode_first_stage(vp, f, k))
    # ------------------------- eval/sample fork -------------------------
    # Reference parity: train_image_to_video.py:59-109 (log_video: sample an
    # mp4 with the live weights every eval_interval, save under
    # <save>/video/samples_gs_{it:06d}/ + the caption under video_texts/)
    # and :141-170 (forward_step_eval: an eval-batch loss scalar). Sampling
    # prefers the EMA-merged tree — the same weights the shipped checkpoints
    # generate from. Rank-0-gated like the reference's dp-rank-0 fork.
    from fluidnexus_tpu.utils.tb import TrainLogger
    from fluidnexus_tpu.utils.video_io import write_video

    tb = TrainLogger(args.save_dir or None,
                     enabled=bool(args.save_dir) and jax.process_index() == 0)
    eval_loss_fn = jax.jit(functools.partial(engine.loss_fn,
                                             is_i2v=not args.t2v))

    def eval_sample(it, p, ema, latents, captions):
        ep = ema_full_tree(p, ema) if ema is not None else p
        emb = enc([captions[0]])
        uc = enc([""])
        k_eval = jax.random.PRNGKey(args.seed + it)
        eloss, _ = eval_loss_fn(ep, latents[:1], emb, k_eval)
        prefix = latents[:1, : args.fixed_frames] if (
            not args.t2v and args.fixed_frames > 0) else None
        z = engine.sample(ep, latents[:1].shape, emb, uc_text_emb=uc,
                          rng=k_eval, num_steps=args.eval_steps,
                          prefix_clean_frames=prefix)
        frames = engine.decode_first_stage(
            vae_params, jnp.transpose(z, (0, 1, 3, 4, 2)))   # (1,T,H,W,3)
        vid = np.clip((np.asarray(frames[0]) + 1.0) / 2.0, 0.0, 1.0)
        if jax.process_index() == 0 and args.save_dir:
            root = os.path.join(args.save_dir, "video",
                                f"samples_gs_{it:06d}")
            os.makedirs(root, exist_ok=True)
            path = write_video(os.path.join(root, "000000.mp4"),
                               (vid * 255).astype(np.uint8), fps=8)
            tdir = os.path.join(args.save_dir, "video_texts")
            os.makedirs(tdir, exist_ok=True)
            with open(os.path.join(tdir, f"{it:06d}.txt"), "w") as f:
                f.write(str(captions[0]) + "\n")
            tb.scalar("eval/loss", float(eloss), it)
            stride = max(1, vid.shape[0] // 8)
            tb.image_grid("samples", list(vid[::stride][:8]), it)
            log(f"eval @ {it}: loss {float(eloss):.5f} sample -> {path}")
        return float(eloss)

    data_sh = NamedSharding(mesh, P("data"))
    rng = jax.random.PRNGKey(args.seed)
    start_it = 1
    if args.resume_from:
        # <save_dir> with iter_XXXXXXX + train_state_XXXXXXX.npz pairs, or a
        # direct train_state path; params load from the matching iter dir
        state_path = args.resume_from
        if os.path.isdir(state_path):
            states = sorted(f for f in os.listdir(state_path)
                            if f.startswith("train_state_"))
            assert states, f"no train_state_* under {state_path}"
            state_path = os.path.join(args.resume_from, states[-1])
        want_ema = ema_params is not None
        step, rng, opt_state, ema_params = _flat_load(state_path, opt_state,
                                                      ema_params, log=log)
        it_dir = os.path.join(os.path.dirname(state_path), f"iter_{step:07d}")
        from fluidnexus_tpu.core.checkpoint import rebox_like

        # checkpoints are plain trees; re-box into the fresh init's logical-
        # axis metadata so ZeRO/TP layouts survive the resume
        params = jax.device_put(rebox_like(params, load_params(it_dir)),
                                NamedSharding(mesh, P()))
        # _flat_load rebuilt moments as default-device arrays: re-apply the
        # ZeRO/TP placement or the resumed run loses the sharded-optimizer
        # memory layout the 5B recipe depends on
        opt_state = zero_shard_opt_state(opt_state, mesh)
        if want_ema and ema_params is None:
            # seed EMA from the RESUMED trainables
            src = lora_partition(params)[0] if args.lora_rank > 0 else params
            ema_params = jax.tree_util.tree_map(jnp.copy, src)
        start_it = step + 1
        log(f"resumed training state at iter {step} from {state_path}")
    t0 = time.time()
    from fluidnexus_tpu.utils.profiling import StageTimer, annotate, trace

    loss = jnp.asarray(float("nan"))   # stays NaN if the loop runs 0 iters
    if start_it > args.iterations:
        log(f"nothing to do: resumed at iter {start_it - 1} >= --iterations "
            f"{args.iterations}")
    timer = StageTimer()
    with trace(getattr(args, "profile_dir", "")):
        for it in range(start_it, args.iterations + 1):
            with timer.stage("data"):
                frames, captions = ds.sample_batch(args.batch, rng_np)
            rng, k_enc, k_ucg, k_loss = jax.random.split(rng, 4)
            with timer.stage("vae_encode") as st, annotate("vae_encode"):
                z = encode(vae_params, jnp.asarray(frames), k_enc)   # (B,T',H',W',C)
                st.block_on = z
            latents = jax.device_put(jnp.transpose(z, (0, 1, 4, 2, 3)), data_sh)
            txt = apply_ucg(enc(captions), k_ucg, args.ucg_rate)
            txt = jax.device_put(txt, data_sh)
            with timer.stage("train_step") as st, annotate("train_step"):
                params, opt_state, ema_params, loss = train_step(
                    params, opt_state, ema_params, latents, txt, k_loss)
                st.block_on = loss
            if it % args.log_every == 0:
                ips = (it - start_it + 1) / max(time.time() - t0, 1e-9)
                log(f"iter {it}/{args.iterations} loss {float(loss):.5f} "
                    f"({ips:.2f} it/s) [{timer.report()}]")
                tb.scalar("train/loss", float(loss), it)
            if args.eval_interval > 0 and it % args.eval_interval == 0:
                eval_sample(it, params, ema_params, latents, captions)
            if args.save_dir and it % args.save_every == 0:
                save_params(os.path.join(args.save_dir, f"iter_{it:07d}"), jax.device_get(params))
                if ema_params is not None:
                    # the tree the gen CLIs prefer (load_params_prefer_ema)
                    save_params(os.path.join(args.save_dir, f"iter_{it:07d}_ema"),
                                jax.device_get(ema_full_tree(params, ema_params)))
                # optimizer/EMA/rng sidecar for --resume_from
                _flat_save(os.path.join(args.save_dir, f"train_state_{it:07d}.npz"),
                           it, rng, jax.device_get(opt_state),
                           jax.device_get(ema_params) if ema_params is not None else None)
    final_ema = ema_full_tree(params, ema_params) if ema_params is not None else None
    return params, float(loss), final_ema


def build_argparser():
    ap = argparse.ArgumentParser(description="LoRA finetune the video DiT (prefix-i2v)")
    ap.add_argument("--base", nargs="+", default=[],
                    help="reference CogVideoX YAML config(s), merged in order "
                         "(same semantics as the reference --base flag)")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--save_dir", default="")
    ap.add_argument("--resume_from", default="",
                    help="save_dir (or train_state_*.npz) to resume FULL "
                         "training state from: params + optimizer moments + "
                         "EMA + rng + iteration (SAT checkpoint-resume parity)")
    ap.add_argument("--dit_ckpt", default="")
    ap.add_argument("--vae_ckpt", default="")
    ap.add_argument("--t5_dir", default="")
    ap.add_argument("--iterations", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lora_rank", type=int, default=128)
    ap.add_argument("--quant_base", action="store_true",
                    help="int8 (QLoRA-style) frozen base weights — the "
                         "single-16GiB-chip recipe for the 5B LoRA finetune; "
                         "float checkpoints are converted on load")
    ap.add_argument("--ema_decay", type=float, default=0.9999,
                    help="EMA decay of the trainable weights (sat.ops.FusedEmaAdam "
                         "default; the reference's shipped checkpoints sample "
                         "from the EMA tree). 0 disables.")
    ap.add_argument("--fixed_frames", type=int, default=3)
    ap.add_argument("--t2v", action="store_true",
                    help="plain t2v loss (the reference train_video.py "
                         "shared_step) instead of the prefix-i2v default "
                         "(train_image_to_video.py shared_step_i2v)")
    ap.add_argument("--ucg_rate", type=float, default=0.1)
    ap.add_argument("--eval_interval", type=int, default=0,
                    help="sample + save an eval clip every N iters with the "
                         "EMA-merged weights (reference log_video/"
                         "forward_step_eval, train_image_to_video.py:59-170); "
                         "0 disables. --base YAMLs set their eval_interval.")
    ap.add_argument("--eval_steps", type=int, default=20,
                    help="sampler steps for the eval clip")
    ap.add_argument("--num_frames", type=int, default=49)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--save_every", type=int, default=1000)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--allow_fake_conditioning", action="store_true",
                    help="run without real T5 weights using hash "
                         "pseudo-embeddings (test/smoke only; implied "
                         "by --tiny)")
    ap.add_argument("--profile_dir", default="",
                    help="write an XLA profiler trace of the run here "
                         "(view in TensorBoard's Profile tab)")
    ap.add_argument("--encode_chunk", type=int, default=0,
                    help="encode clips in cache-carried temporal chunks of "
                         "this many latent frames (0 = whole clip; needed "
                         "for 480x720 clips on one 16GiB chip)")
    return ap


def apply_base_yaml(ap, argv=None):
    """Two-pass parse: --base YAML(s) set the defaults (reference sat config
    merge), explicit CLI flags still win. Returns the parsed args with a
    `.run_cfg` attribute (CogVideoXRunConfig or None)."""
    pre, _ = ap.parse_known_args(argv)
    cfg = None
    if pre.base:
        from fluidnexus_tpu.diffusion.video.config_yaml import load_cogvideox_yaml

        cfg = load_cogvideox_yaml(pre.base)
        t = cfg.train
        ap.set_defaults(
            iterations=t.train_iters, batch=t.micro_batch, lr=t.lr,
            lora_rank=cfg.lora_rank, fixed_frames=cfg.fixed_frames,
            ucg_rate=cfg.ucg_rate, num_frames=t.max_num_frames,
            height=t.video_size[0], width=t.video_size[1],
            log_every=t.log_interval, save_every=t.save_interval,
            save_dir=t.save, eval_interval=t.eval_interval,
            data_root=(t.train_data[0] if t.train_data else ""),
            t5_dir=cfg.t5_dir,
        )
    args = ap.parse_args(argv)
    args.run_cfg = cfg
    if not args.data_root:
        ap.error("--data_root is required (directly or via --base train_data)")
    return args


def main(argv=None):
    train(apply_base_yaml(build_argparser(), argv))


if __name__ == "__main__":
    main()
