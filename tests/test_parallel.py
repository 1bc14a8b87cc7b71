import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig
from fluidnexus_tpu.diffusion.video.engine import VideoEngine, freeze_non_lora
from fluidnexus_tpu.parallel.cp import cp_causal_conv_time, halo_exchange_time
from fluidnexus_tpu.parallel.mesh import make_mesh, zero_shard_opt_state

TINY = VideoDiTConfig(
    hidden_size=64, num_layers=2, num_heads=4, patch_size=2, in_channels=4,
    out_channels=4, text_hidden_size=32, text_length=5, latent_frames=3,
    latent_height=8, latent_width=8, dtype=jnp.float32, lora_rank=4,
)


def test_mesh_shapes():
    mesh = make_mesh(8, tp=2, time=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "time": 2}


def _unfreeze_gates(params):
    """adaLN is zero-init (gates 0 -> attention/MLP branches carry no grad at
    step 0, by DiT design); nudge the modulation biases so grads flow."""

    def bump(path, v):
        names = "".join(str(p) for p in path)
        if "adaLN" in names and "bias" in names:
            return v + 0.3
        return v

    return jax.tree_util.tree_map_with_path(bump, params)


@pytest.mark.slow
def test_engine_loss_and_lora_freeze():
    eng = VideoEngine(TINY, fixed_frames=1)
    params = _unfreeze_gates(eng.init_params(jax.random.PRNGKey(0)))
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 8, 8))
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))

    loss, aux = eng.loss_fn(params, latents, txt, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))

    grads = jax.grad(lambda p: eng.loss_fn(p, latents, txt, jax.random.PRNGKey(3))[0])(params)
    frozen = freeze_non_lora(grads)
    leaves = jax.tree_util.tree_leaves_with_path(frozen)
    lora_norm = sum(float(jnp.abs(v).sum()) for p, v in leaves if "lora" in str(p))
    base_norm = sum(float(jnp.abs(v).sum()) for p, v in leaves if "lora" not in str(p))
    assert lora_norm > 0
    assert base_norm == 0


@pytest.mark.slow
def test_dp_tp_train_step_on_mesh():
    """Full LoRA finetune step over a dp=2 x tp=2 mesh; GSPMD shards the
    attention/MLP matmuls over 'model' (the SAT ColumnParallelLinear
    equivalent) and the batch over 'data'."""
    mesh = make_mesh(8, tp=2, time=2)
    eng = VideoEngine(TINY, fixed_frames=1)
    params = _unfreeze_gates(eng.init_params(jax.random.PRNGKey(0)))
    params = jax.device_put(params, NamedSharding(mesh, P()))

    import optax

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    opt_state = zero_shard_opt_state(opt_state, mesh)

    latents = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (4, 3, 4, 8, 8)),
        NamedSharding(mesh, P("data")))
    txt = jax.device_put(jax.random.normal(jax.random.PRNGKey(2), (4, 5, 32)),
                         NamedSharding(mesh, P("data")))

    @jax.jit
    def train_step(p, s, lat, tx, rng):
        loss, grads = jax.value_and_grad(lambda q: eng.loss_fn(q, lat, tx, rng)[0])(p)
        grads = freeze_non_lora(grads)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    p2, s2, loss = train_step(params, opt_state, latents, txt, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # LoRA params moved, base froze
    diff_lora = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
    moved = [(p, v) for p, v in jax.tree_util.tree_leaves_with_path(diff_lora) if v > 0]
    assert moved and all("lora" in str(p) for p, v in moved)


def test_halo_exchange_matches_serial():
    """Time-sharded causal conv == serial causal conv (the CP property the
    reference implements with NCCL P2P, cp_enc_dec.py:199-242)."""
    mesh = make_mesh(8, tp=1, time=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 4, 4, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))  # (kt, c) depthwise-ish

    def valid_time_conv(xp):
        # simple temporal FIR per channel: y[t] = sum_k xp[t+k] * kernel[k]
        return sum(xp[:, k:k + xp.shape[1] - 2] * kernel[k][None, None, None, None, :]
                   for k in range(3))

    # serial reference with causal first-frame pad
    xp_full = jnp.concatenate([jnp.repeat(x[:, :1], 2, 1), x], 1)
    serial = valid_time_conv(xp_full)

    cp_fn = cp_causal_conv_time(valid_time_conv, mesh, kernel_t=3)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P(None, "time", None, None, None)))
    out = cp_fn(x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(serial), atol=1e-5)


def test_camera_dp_render_grads_on_mesh():
    """FluidDynamics-stage data parallelism: the per-frame fit batches
    CAMERAS (reference batch 1-2, configs/*.json); here 8 cameras shard over
    the 8-device 'data' axis via shard_map and the psum'd grads must equal
    the serial sum of per-camera grads (the SPMD replacement for the
    reference's single-GPU camera loop)."""
    from functools import partial

    from jax import shard_map

    from fluidnexus_tpu.data.cameras import Camera
    from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize

    mesh = make_mesh(8, dp=8)
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    T = -R.T @ np.array([0.0, 0.0, 3.0])
    cams = [Camera(uid=i, R=R, T=T + 0.03 * i, fovx=0.8, fovy=0.6, width=32, height=32)
            for i in range(8)]
    rng = np.random.default_rng(5)
    n = 24
    means = jnp.asarray(rng.uniform(-0.6, 0.6, (n, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    ops = jnp.asarray(rng.uniform(0.3, 0.9, (n,)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-3.0, -2.0, (n, 3))), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    cfg = RasterizerConfig(tile_capacity=32, chunk=8, dup_x=2, dup_y=2, backend="xla")
    views = jnp.stack([jnp.asarray(c.world_view) for c in cams])
    projs = jnp.stack([jnp.asarray(c.full_proj) for c in cams])

    def cam_loss(m, view, proj):
        out = rasterize(m, cols, ops, scales, rots, view_matrix=view, proj_matrix=proj,
                        tan_fovx=cams[0].tan_fovx, tan_fovy=cams[0].tan_fovy,
                        width=32, height=32, bg_color=jnp.zeros(3), config=cfg)
        return (out.color ** 2).sum()

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P("data"), P("data")),
             out_specs=P(), check_vma=False)
    def dp_grads(m, v, p):
        g = jax.grad(lambda q: cam_loss(q, v[0], p[0]))(m)
        return jax.lax.psum(g, "data")

    g_dp = dp_grads(means, views, projs)
    g_serial = sum(jax.grad(lambda q, v=v, p=p: cam_loss(q, v, p))(means)
                   for v, p in zip(views, projs))
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_serial),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_lora_partitioned_grads_match_frozen_full():
    """Partitioned LoRA training (grad over ONLY the lora subtree) must give
    the same LoRA gradients as the full-tree grad + freeze_non_lora path
    (which at 5B would materialize 10.4 GiB of dead base cotangents)."""
    from fluidnexus_tpu.diffusion.video.engine import lora_merge, lora_partition

    eng = VideoEngine(TINY, fixed_frames=1)
    params = _unfreeze_gates(eng.init_params(jax.random.PRNGKey(0)))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 8, 8))
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
    key = jax.random.PRNGKey(3)

    lora, base = lora_partition(params)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), lora_merge(lora, base), params))
    assert all("lora" in str(p)
               for p, _ in jax.tree_util.tree_leaves_with_path(lora))

    g_full = freeze_non_lora(jax.grad(
        lambda p: eng.loss_fn(p, lat, txt, key)[0])(params))
    g_lora = jax.grad(
        lambda lp: eng.loss_fn(lora_merge(lp, base), lat, txt, key)[0])(lora)
    full_map = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(g_full)
                if "lora" in str(p)}
    part_map = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(g_lora)}
    assert set(full_map) == set(part_map) and part_map
    for k in full_map:
        np.testing.assert_array_equal(np.asarray(full_map[k]), np.asarray(part_map[k]))


def test_tp_sharded_generation_matches_single():
    """shard_for_generation places DiT params over 'model' by their logical
    axes and the sampler runs under the mesh (the gen CLIs' --tp path,
    replacing the reference's CPU<->GPU offload ping-pong,
    gen_refine_pi2v_long.py:203-239). TP output == single-device output."""
    eng = VideoEngine(TINY, fixed_frames=0)
    params = eng.init_params(jax.random.PRNGKey(0))
    shape = (1, TINY.latent_frames, TINY.in_channels, TINY.latent_height, TINY.latent_width)
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 32))
    uc = jnp.zeros_like(txt)

    ref = eng.sample(params, shape, txt, uc, rng=jax.random.PRNGKey(3), num_steps=3)

    mesh = make_mesh(8, dp=2, tp=4)
    eng2 = VideoEngine(TINY, fixed_frames=0)  # fresh jit cache
    p_tp, _ = eng2.shard_for_generation(params, None, mesh)
    # the sharding really is over 'model' for at least the mlp/head kernels
    import flax.linen as nn

    specs = [x.unbox().sharding.spec if isinstance(x, nn.meta.AxisMetadata) else x.sharding.spec
             for x in jax.tree.leaves(p_tp, is_leaf=lambda x: isinstance(x, nn.meta.AxisMetadata))]
    assert any("model" in [a for a in s if a] for s in specs), specs
    out = eng2.sample(p_tp, shape, txt, uc, rng=jax.random.PRNGKey(3), num_steps=3)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)


def test_shard_for_generation_plain_tree():
    """Checkpoint-loaded (plain, unboxed) param trees get their TP specs from
    an eval_shape of init_params."""
    eng = VideoEngine(TINY, fixed_frames=0)
    params = eng.init_params(jax.random.PRNGKey(0))
    import flax.linen as nn

    plain = jax.tree.map(lambda x: x.unbox() if isinstance(x, nn.meta.AxisMetadata) else x,
                         params, is_leaf=lambda x: isinstance(x, nn.meta.AxisMetadata))
    plain = jax.tree.map(np.asarray, plain)   # simulate load_params output
    mesh = make_mesh(8, dp=2, tp=4)
    p_tp, _ = eng.shard_for_generation(plain, None, mesh)
    specs = [x.sharding.spec for x in jax.tree.leaves(p_tp)]
    assert any("model" in [a for a in s if a] for s in specs), specs
