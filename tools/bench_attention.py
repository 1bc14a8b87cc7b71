"""Adversarial head-to-head on the 5B joint-attention shape (VERDICT r2 #3).

Round-2 state: flash attention with 512-blocks runs 66 ms/layer at the real
(1, 48, 17776, 64) shape and was accepted as "intrinsically VPU-bound".
This bench challenges that with the counter-moves the judge named:

  a) flash 512-blocks            (the shipped kernel, baseline)
  b) flash 1024-blocks           (fewer carry iterations)
  c) splash attention            (pallas splash MHA, full mask)
  d) bf16 q/k/v into flash       (halves VMEM traffic per block)
  e) XLA dot_product_attention   (whatever the compiler picks)

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attention.py [--seq 17776]
Prints ms/layer for each variant; fold the winner into dit.py _joint_attention.
"""
import argparse
import functools
import time

import numpy as np


def timeit(fn, *args, iters=4):
    """fn must return a SCALAR (device-side reduction): through the axon
    relay, block_until_ready on a raw kernel output was observed returning
    before execution (flash read 0.11 ms/layer for a 30-TFLOP attention);
    fetching a reduced scalar forces real completion."""
    import jax

    s = fn(*args)
    float(s)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(*args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=17776)
    ap.add_argument("--heads", type=int, default=48)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bwd", action="store_true",
                    help="sweep BACKWARD block sizes (fwd fixed at 512): the "
                    "5B LoRA step spends its time in the flash dq/dkv sweeps "
                    "and the dit.py bb=128 default was never device-measured")
    args = ap.parse_args()

    b, h, s, d = args.batch, args.heads, args.seq, args.dim
    pad = (-s) % 512
    sp = s + pad
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, sp, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, sp, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, sp, d)), jnp.float32)
    sm = 1.0 / float(np.sqrt(d))
    print(f"shape: b={b} h={h} s={s} (padded {sp}) d={d}")

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    def flash_bs(bs):
        blocks = BlockSizes(block_q=bs, block_k_major=bs, block_k=bs, block_b=1,
                            block_q_major_dkv=128, block_k_major_dkv=128,
                            block_k_dkv=128, block_q_dkv=128,
                            block_k_major_dq=128, block_k_dq=128, block_q_dq=128)

        @jax.jit
        def f(qq, kk, vv):
            o = flash_attention(qq, kk, vv, causal=False, sm_scale=sm,
                                block_sizes=blocks)
            return jnp.sum(o.astype(jnp.float32))

        return f

    if args.bwd:
        def flash_fwdbwd(bb):
            blocks = BlockSizes(
                block_q=512, block_k_major=512, block_k=512, block_b=1,
                block_q_major_dkv=bb, block_k_major_dkv=bb, block_k_dkv=bb,
                block_q_dkv=bb, block_k_major_dq=bb, block_k_dq=bb,
                block_q_dq=bb)

            @jax.jit
            def f(qq, kk, vv):
                def loss(t):
                    o = flash_attention(*t, causal=False, sm_scale=sm,
                                        block_sizes=blocks)
                    return jnp.sum(o.astype(jnp.float32))

                l, g = jax.value_and_grad(loss)((qq, kk, vv))
                return l + sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in g)

            return f

        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        print("\n== ms/layer (fwd+bwd, fwd blocks 512, bf16 in) ==")
        for bb in (128, 256, 512):
            try:
                ms = timeit(flash_fwdbwd(bb), qb, kb, vb, iters=2)
                print(f"  bwd_blocks_{bb:<4d} {ms:9.2f} ms", flush=True)
            except Exception as e:
                print(f"  bwd_blocks_{bb} failed: {type(e).__name__}: {e}",
                      flush=True)
        return

    results = {}
    for bs in (512, 1024):
        if sp % bs == 0:
            try:
                results[f"flash_{bs}"] = timeit(flash_bs(bs), q, k, v)
            except Exception as e:
                print(f"flash_{bs} failed: {type(e).__name__}: {e}")

    # bf16 inputs into the 512-block flash
    try:
        fn = flash_bs(512)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        results["flash_512_bf16"] = timeit(fn, qb, kb, vb)
    except Exception as e:
        print(f"flash bf16 failed: {type(e).__name__}: {e}")

    # splash attention (full mask)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sak, splash_attention_mask as sam)

        mask = sam.MultiHeadMask([sam.FullMask((sp, sp)) for _ in range(h)])
        for blk in (512, 1024, 2048):
            try:
                bs_cfg = sak.BlockSizes(
                    block_q=blk, block_kv=blk, block_kv_compute=blk,
                    block_q_dkv=128, block_kv_dkv=128, block_kv_dkv_compute=128,
                    block_q_dq=128, block_kv_dq=128)
                kernel = sak.make_splash_mha_single_device(mask=mask, block_sizes=bs_cfg)

                @jax.jit
                def splash(qq, kk, vv):
                    # splash is per-batch (h, s, d); vmap over batch
                    o = jax.vmap(kernel)(qq * sm, kk, vv)
                    return jnp.sum(o.astype(jnp.float32))

                results[f"splash_{blk}"] = timeit(splash, q, k, v)
            except Exception as e:
                print(f"splash_{blk} failed: {type(e).__name__}: {e}")
    except Exception as e:
        print(f"splash unavailable: {type(e).__name__}: {e}")

    # XLA fused attention
    try:
        @jax.jit
        def xla_attn(qq, kk, vv):
            o = jax.nn.dot_product_attention(
                qq.transpose(0, 2, 1, 3), kk.transpose(0, 2, 1, 3),
                vv.transpose(0, 2, 1, 3), scale=sm)
            return jnp.sum(o.astype(jnp.float32))

        results["xla_dpa"] = timeit(xla_attn, q, k, v)
    except Exception as e:
        print(f"xla failed: {type(e).__name__}: {e}")

    print("\n== ms/layer (fwd) ==")
    for name, ms in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {name:18s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
