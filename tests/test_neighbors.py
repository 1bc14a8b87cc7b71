import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.ops.knn import mean_dist_to_knn
from fluidnexus_tpu.ops.neighbors import radius_graph, radius_query


def brute_neighbors(x, y, r, include_self, self_pairs):
    d = np.linalg.norm(y[:, None] - x[None, :], axis=-1)
    out = []
    for i in range(len(y)):
        idx = np.where(d[i] <= r)[0]
        if not include_self and self_pairs:
            idx = idx[idx != i]
        out.append(set(idx.tolist()))
    return out


def test_radius_graph_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    r = 0.15
    nl = radius_graph(jnp.asarray(x), r, k=64, loop=True)
    got_idx = np.asarray(nl.idx)
    got_mask = np.asarray(nl.mask)
    expect = brute_neighbors(x, x, r, include_self=True, self_pairs=True)
    assert int(nl.overflow) == 0
    for i in range(len(x)):
        got = set(got_idx[i][got_mask[i]].tolist())
        assert got == expect[i], f"row {i}: {got ^ expect[i]}"


def test_radius_graph_no_loop():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    r = 0.2
    nl = radius_graph(jnp.asarray(x), r, k=128, loop=False)
    got_idx = np.asarray(nl.idx)
    got_mask = np.asarray(nl.mask)
    expect = brute_neighbors(x, x, r, include_self=False, self_pairs=True)
    for i in range(len(x)):
        got = set(got_idx[i][got_mask[i]].tolist())
        assert got == expect[i]
        assert i not in got


def test_radius_query_cross_set():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (250, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (60, 3)).astype(np.float32)
    r = 0.18
    nl = radius_query(jnp.asarray(x), jnp.asarray(y), r, k=96)
    expect = brute_neighbors(x, y, r, include_self=True, self_pairs=False)
    for i in range(len(y)):
        got = set(np.asarray(nl.idx)[i][np.asarray(nl.mask)[i]].tolist())
        assert got == expect[i]


def test_k_cap_keeps_nearest():
    x = np.array([[0, 0, 0], [0.01, 0, 0], [0.02, 0, 0], [0.09, 0, 0]], np.float32)
    y = np.zeros((1, 3), np.float32)
    nl = radius_query(jnp.asarray(x), jnp.asarray(y), 0.1, k=2)
    got = sorted(np.asarray(nl.idx)[0][np.asarray(nl.mask)[0]].tolist())
    assert got == [0, 1]


def test_alive_mask():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    alive = jnp.arange(100) < 50
    nl = radius_graph(jnp.asarray(x), 0.3, k=64, loop=True, alive=alive)
    idx, mask = np.asarray(nl.idx), np.asarray(nl.mask)
    assert not np.any(idx[mask] >= 50)
    assert mask[50:].sum() == 0


def test_mean_dist_to_knn():
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (120, 3)).astype(np.float32)
    got = np.asarray(mean_dist_to_knn(jnp.asarray(x), k=3, chunk=32))
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1) ** 2
    np.fill_diagonal(d, np.inf)
    expect = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, expect, rtol=1e-4)
