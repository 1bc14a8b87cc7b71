"""Finetuning the novel-view LDM on a single capture.

Parity target: Zero123/main.py (:30-296) + ldm/data/fluid_nexus.py
(FluidNexusStaticData:113): dataset of (cond view, target view) pairs from the
5-camera rig with camera/{i:02d}.npy W2C matrices; batch 96 across 4 GPUs with
base LR 1e-4 scaled by bs*ngpu (main.py:279-289); cc_projection at 10x LR
(ddpm.py:1628-1635); the upstream zero123-xl checkpoint's 4->8 channel input
port (main.py:109-128) happens at weight-port time, not here.

TPU: data-parallel over the 'data' mesh axis; one jitted train step.
"""
from __future__ import annotations

import functools

import argparse
import os
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fluidnexus_tpu.core.checkpoint import load_params, save_params
from fluidnexus_tpu.diffusion.ldm.model import NovelViewModel, get_pose_delta
from fluidnexus_tpu.parallel.mesh import make_mesh


def lambda_linear_schedule(base_lr: float, warm_up_steps: int = 100,
                           f_start: float = 1e-6, f_max: float = 1.0,
                           f_min: float = 1.0, cycle_length: float = 1e13):
    """Optax-compatible LambdaLinearScheduler (Zero123/ldm/lr_scheduler.py:82-100
    with the fluid_nexus_smoke.yaml scheduler_config values): linear warmup
    f_start -> f_max over warm_up_steps, then a linear glide toward f_min over
    cycle_length (effectively constant at the reference's huge cycle)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (f_max - f_start) / max(warm_up_steps, 1) * step + f_start
        tail = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        return base_lr * jnp.where(step < warm_up_steps, warm, tail)

    return schedule


class ViewPairDataset:
    """frame_%03d/{cam:02d}.png + camera/{cam:02d}.npy (the layout emitted by
    DataProcessing/fluid_nexus_real/create_zero123_dataset.py).

    cond_view/target_view: when BOTH are valid camera ids the pair is fixed
    (ldm/data/fluid_nexus.py:213-218); otherwise random without replacement
    (the FluidNexus finetune default)."""

    def __init__(self, root: str, image_size: int = 256,
                 cond_view: int = -1, target_view: int = -1):
        self.root = root
        self.image_size = image_size
        self.frames = sorted(d for d in os.listdir(root) if d.startswith("frame_"))
        cam_dir = os.path.join(root, "camera")
        self.cams = {int(f[:2]): np.load(os.path.join(cam_dir, f))
                     for f in os.listdir(cam_dir) if f.endswith(".npy")}
        self.cam_ids = sorted(self.cams)
        self.fixed_pair = None
        if cond_view in self.cams and target_view in self.cams:
            self.fixed_pair = (target_view, cond_view)

    def _img(self, frame: str, cam: int):
        from PIL import Image

        p = os.path.join(self.root, frame, f"{cam:02d}.png")
        img = Image.open(p).convert("RGB").resize((self.image_size,) * 2, Image.LANCZOS)
        return np.asarray(img, np.float32) / 255.0

    def sample_batch(self, batch: int, rng: np.random.Generator):
        tgt, cond, dt = [], [], []
        for _ in range(batch):
            frame = self.frames[rng.integers(len(self.frames))]
            if self.fixed_pair is not None:
                a, b = self.fixed_pair
            else:
                a, b = rng.choice(self.cam_ids, 2, replace=False)
            tgt.append(self._img(frame, a))
            cond.append(self._img(frame, b))
            dt.append(get_pose_delta(self.cams[a], self.cams[b]))
        return np.stack(tgt), np.stack(cond), np.stack(dt)


class ViewPairWebDataset:
    """Tar-shard streaming variant of :class:`ViewPairDataset` — parity with
    the reference's webdataset-wrapped finetune loader
    (Zero123/ldm/data/fluid_nexus.py:79-82). Each tar SAMPLE is one frame:
    members ``<frame_key>.<cam:02d>.png`` (all captured views of that frame);
    poses come from ``<root>/camera/<cam:02d>.npy`` exactly like the folder
    loader. Shards are rank-dealt, samples reservoir-shuffled RAW (decode on
    pop — the same shuffle-before-decode order as WebVideoDataset), and the
    stream restarts per epoch. Fails loudly if a full pass yields nothing."""

    def __init__(self, root: str, image_size: int = 256, cond_view: int = -1,
                 target_view: int = -1, seed: int = 1,
                 shuffle_buffer: int = 256, rank: int = 0, world: int = 1):
        import glob as _glob

        self.root = root
        self.image_size = image_size
        shards = sorted(_glob.glob(os.path.join(root, "**", "*.tar"),
                                   recursive=True)) if os.path.isdir(root) \
            else sorted(_glob.glob(root))
        assert shards, f"no .tar shards under {root}"
        rng = np.random.default_rng(seed)
        self.shards = list(rng.permutation(shards))[rank::world]
        cam_dir = os.path.join(os.path.dirname(self.shards[0]) if not
                               os.path.isdir(root) else root, "camera")
        self.cams = {int(f[:2]): np.load(os.path.join(cam_dir, f))
                     for f in os.listdir(cam_dir) if f.endswith(".npy")}
        self.fixed_pair = None
        if cond_view in self.cams and target_view in self.cams:
            self.fixed_pair = (target_view, cond_view)
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self._stream = None

    def _iter_samples(self):
        import tarfile

        for shard in self.shards:
            with tarfile.open(shard) as tf:
                cur_key, cur = None, {}
                for m in tf:
                    if not m.isfile():
                        continue
                    base = os.path.basename(m.name)
                    key, _, suffix = base.partition(".")
                    if cur_key is not None and key != cur_key and cur:
                        yield cur
                        cur = {}
                    cur_key = key
                    cur[suffix.lower()] = tf.extractfile(m).read()
                if cur:
                    yield cur

    def _decode(self, raw: dict, rng: np.random.Generator):
        import io

        from PIL import Image

        avail = sorted(c for c in self.cams if f"{c:02d}.png" in raw)
        if self.fixed_pair is not None:
            a, b = self.fixed_pair
            if a not in avail or b not in avail:
                return None
        elif len(avail) >= 2:
            a, b = rng.choice(avail, 2, replace=False)
        else:
            return None

        def img(cam):
            im = Image.open(io.BytesIO(raw[f"{cam:02d}.png"])).convert("RGB")
            im = im.resize((self.image_size,) * 2, Image.LANCZOS)
            return np.asarray(im, np.float32) / 255.0

        return img(a), img(b), get_pose_delta(self.cams[a], self.cams[b])

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        buf = []
        for raw in self._iter_samples():
            buf.append(raw)
            if len(buf) >= self.shuffle_buffer:
                item = self._decode(buf.pop(int(rng.integers(len(buf)))), rng)
                if item is not None:
                    yield item
        rng.shuffle(buf)
        for raw in buf:
            item = self._decode(raw, rng)
            if item is not None:
                yield item

    def sample_batch(self, batch: int, rng: np.random.Generator):
        tgt, cond, dt = [], [], []
        retried = False
        while len(tgt) < batch:
            if self._stream is None:
                self._stream = iter(self)
            item = next(self._stream, None)
            if item is None:
                if retried and not tgt:
                    raise RuntimeError(
                        f"no usable frame samples in shards under {self.root}"
                        " (need >=2 views per sample matching camera/*.npy)")
                self._stream, retried = None, True
                continue
            retried = False
            tgt.append(item[0])
            cond.append(item[1])
            dt.append(item[2])
        return np.stack(tgt), np.stack(cond), np.stack(dt)


def make_pair_dataset(root: str, image_size: int = 256, cond_view: int = -1,
                      target_view: int = -1, seed: int = 1):
    """Folder layout -> ViewPairDataset; .tar shards -> ViewPairWebDataset
    (mirrors data.video_dataset.make_video_dataset's auto-pick)."""
    import glob as _glob

    if (not os.path.isdir(root)) or _glob.glob(os.path.join(root, "**", "*.tar"),
                                               recursive=True):
        return ViewPairWebDataset(root, image_size, cond_view=cond_view,
                                  target_view=target_view, seed=seed)
    return ViewPairDataset(root, image_size, cond_view=cond_view,
                           target_view=target_view)


def train(args, log=print):
    import math

    dp = math.gcd(args.batch, jax.device_count())
    mesh = make_mesh(dp, dp=dp)
    if args.tiny:
        from fluidnexus_tpu.diffusion.ldm.autoencoder import KLVAEConfig
        from fluidnexus_tpu.diffusion.ldm.clip import CLIPVisionConfig
        from fluidnexus_tpu.diffusion.ldm.unet import UNetConfig

        model = NovelViewModel(
            unet_config=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                                   attention_resolutions=(2,), num_heads=4, context_dim=768),
            vae_config=KLVAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
            clip_config=CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=1,
                                         heads=4, output_dim=768),
        )
    else:
        model = NovelViewModel()
    params = load_params(args.ckpt) if args.ckpt else model.init_params(
        jax.random.PRNGKey(0), image_size=args.image_size)
    params = jax.device_put(params, NamedSharding(mesh, P()))

    # per-group LR: cc_projection at 10x (ddpm.py:1628-1635); vae+clip frozen;
    # LambdaLinearScheduler warmup (configs/*.yaml scheduler_config)
    base_lr = args.lr * args.batch if args.scale_lr else args.lr
    lr_fn = lambda_linear_schedule(base_lr, warm_up_steps=args.warmup_steps)
    cc_lr_fn = lambda_linear_schedule(10 * base_lr, warm_up_steps=args.warmup_steps)

    def label_fn(params):
        return {"unet": "train", "cc": "cc", "vae": "frozen", "clip": "frozen"}

    opt = optax.multi_transform(
        {"train": optax.adamw(lr_fn), "cc": optax.adamw(cc_lr_fn),
         "frozen": optax.set_to_zero()},
        label_fn,
    )
    opt_state = opt.init(params)

    # LitEma parity (ldm/models/diffusion/ddpm.py:111-113 + ldm/modules/ema.py):
    # shadow the TRAINABLE subtrees (unet + cc_projection; vae/clip are frozen
    # so their shadow would never move) at decay 0.9999 with the
    # min(decay, (1+n)/(10+n)) warmup; checkpoints store the EMA-overlaid tree
    # as the `_ema` sibling that load_params_prefer_ema picks up at inference.
    _EMA_KEYS = ("unet", "cc")
    ema_decay = args.ema_decay
    ema_params = ({k: jax.tree.map(jnp.copy, params[k]) for k in _EMA_KEYS}
                  if ema_decay > 0 else None)

    ds = make_pair_dataset(args.data_dir, args.image_size,
                           cond_view=args.cond_view, target_view=args.target_view,
                           seed=args.seed)
    rng_np = np.random.default_rng(args.seed)
    data_sh = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(p, s, ema, n_updates, tgt, cond, dt, rng):
        loss, grads = jax.value_and_grad(
            lambda q: model.loss_fn(q, tgt, cond, dt, rng))(p)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        if ema is not None:
            n = n_updates.astype(jnp.float32) + 1.0
            d = jnp.minimum(jnp.float32(ema_decay), (1.0 + n) / (10.0 + n))
            ema = jax.tree.map(lambda e, q: e - (1.0 - d) * (e - q),
                               ema, {k: p[k] for k in _EMA_KEYS})
        return p, s, ema, loss

    def ema_full_tree():
        """params with the trainable subtrees replaced by their EMA shadow."""
        return {**params, **ema_params}

    from fluidnexus_tpu.utils.tb import TrainLogger, device_memory_stats

    tb = TrainLogger(args.save_dir or None)

    def log_images(it, tgt, cond, dt_j, rng):
        """ImageLogger parity (Zero123/helpers/custom_callbacks.py:77-115 +
        configs/*.yaml lightning.callbacks.image_logger: every
        batch_frequency steps log inputs / targets / CFG-3.0 samples as TB
        grids; N capped like max_images)."""
        n = min(args.batch, args.max_log_images)
        samples = model.ddim_sample(params, cond[:n], dt_j[:n], rng,
                                    num_steps=args.sample_steps, cfg_scale=3.0,
                                    image_size=args.image_size)
        tb.image_grid("train/conditioning", np.asarray(cond[:n]), it)
        tb.image_grid("train/targets", np.asarray(tgt[:n]), it)
        tb.image_grid("train/samples_cfg_scale_3.00", np.asarray(samples), it)

    from fluidnexus_tpu.utils.profiling import trace

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    profile_cm = trace(getattr(args, "profile_dir", ""))
    profile_cm.__enter__()
    try:
        for it in range(1, args.iterations + 1):
            tgt, cond, dt = ds.sample_batch(args.batch, rng_np)
            rng, k = jax.random.split(rng)
            tgt = jax.device_put(jnp.asarray(tgt), data_sh)
            cond = jax.device_put(jnp.asarray(cond), data_sh)
            dt_j = jax.device_put(jnp.asarray(dt, jnp.float32), data_sh)
            params, opt_state, ema_params, loss = train_step(
                params, opt_state, ema_params, jnp.int32(it - 1),
                tgt, cond, dt_j, k)
            if it % args.log_every == 0:
                ips = it / (time.time() - t0)
                mem = device_memory_stats()
                mem_s = f" peak {mem['peak_mib']:.0f}MiB" if "peak_mib" in mem else ""
                log(f"iter {it}/{args.iterations} loss {float(loss):.5f} "
                    f"({ips:.2f} it/s){mem_s}")
                tb.scalar("train/loss", float(loss), it)
                tb.scalar("train/lr_abs", float(lr_fn(it)), it)
                tb.scalar("perf/iters_per_sec", ips, it)
                tb.scalars("perf", mem, it)
            if tb.enabled and args.sample_every and (it == 1 or it % args.sample_every == 0):
                rng, ks = jax.random.split(rng)
                log_images(it, tgt, cond, dt_j, ks)
            if args.save_dir and it % args.save_every == 0:
                base = os.path.join(args.save_dir, f"iter_{it:07d}")
                save_params(base, jax.device_get(params))
                if ema_params is not None:
                    save_params(base + "_ema", jax.device_get(ema_full_tree()))
    except KeyboardInterrupt:
        # melk parity (Zero123/main.py:254-260 + custom_callbacks.py:34-38):
        # save a last checkpoint on interrupt, then re-raise
        if args.save_dir:
            save_params(os.path.join(args.save_dir, "last"), jax.device_get(params))
            if ema_params is not None:
                save_params(os.path.join(args.save_dir, "last_ema"),
                            jax.device_get(ema_full_tree()))
            log(f"interrupted: saved {os.path.join(args.save_dir, 'last')}")
        raise
    finally:
        profile_cm.__exit__(None, None, None)
        tb.close()
    return params, float(loss), ema_params


def build_argparser():
    ap = argparse.ArgumentParser(description="finetune the novel-view LDM")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", default="")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--iterations", type=int, default=52000)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--scale_lr", action="store_true")
    ap.add_argument("--warmup_steps", type=int, default=100,
                    help="LambdaLinearScheduler warm_up_steps (yaml scheduler_config)")
    ap.add_argument("--cond_view", type=int, default=-1,
                    help="fix the conditioning camera (with --target_view); -1 = random pairs")
    ap.add_argument("--target_view", type=int, default=-1)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--ema_decay", type=float, default=0.9999,
                    help="LitEma decay on the trainable subtrees "
                         "(ddpm.py:111-113); 0 disables the shadow")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--save_every", type=int, default=1000)
    # ImageLogger parity: batch_frequency 1000, max_images 32, log_first_step
    # (configs/fluid_nexus_smoke.yaml:98-111); 0 disables
    ap.add_argument("--sample_every", type=int, default=1000)
    ap.add_argument("--max_log_images", type=int, default=32)
    ap.add_argument("--sample_steps", type=int, default=50)
    ap.add_argument("--profile_dir", default="",
                    help="write an XLA profiler trace here (TB Profile tab)")
    ap.add_argument("--tiny", action="store_true")
    return ap


def main(argv=None):
    train(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
