"""Per-layer allclose tests of the conv layers vs NumPy oracles.

This is the "per-layer activations allclose vs DGL" parity strategy from
BASELINE.json, implemented against independent NumPy reference math (DGL
layer semantics re-derived by hand)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgnn_tpu.constants import EMPTY_KEY
from xgnn_tpu.models import GATConv, GCNConv, GNN, PinSAGEConv, SAGEConv
from xgnn_tpu.types import Block


def make_block(rng, num_dst=10, num_src=30, fanout=4, dst_cap=16, src_cap=32, weighted=False):
    neigh = np.full((dst_cap, fanout), EMPTY_KEY, np.int32)
    weights = np.zeros((dst_cap, fanout), np.float32)
    for i in range(num_dst):
        k = rng.integers(0, fanout + 1)
        neigh[i, :k] = rng.integers(0, num_src, k)
        weights[i, :k] = rng.random(k).astype(np.float32) + 0.5
    return Block(
        neigh=jnp.asarray(neigh),
        num_dst=jnp.int32(num_dst),
        num_src=jnp.int32(num_src),
        weights=jnp.asarray(weights) if weighted else None,
    )


def leaky_relu(x, s=0.2):
    return np.where(x > 0, x, s * x)


def test_sage_conv_oracle(rng):
    blk = make_block(rng)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    conv = SAGEConv(out_dim=6)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    out = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    w_self = np.asarray(params["params"]["Dense_0"]["kernel"])
    w_neigh = np.asarray(params["params"]["Dense_1"]["kernel"])
    b = np.asarray(params["params"]["Dense_1"]["bias"])
    neigh = np.asarray(blk.neigh)
    for i in range(int(blk.num_dst)):
        ids = neigh[i][neigh[i] != EMPTY_KEY]
        mean = h[ids].mean(0) if len(ids) else np.zeros(8, np.float32)
        exp = h[i] @ w_self + mean @ w_neigh + b
        np.testing.assert_allclose(out[i], exp, rtol=1e-4, atol=1e-5)


def test_pinsage_conv_weighted_oracle(rng):
    blk = make_block(rng, weighted=True)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    conv = PinSAGEConv(out_dim=6)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    out = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    w_self = np.asarray(params["params"]["Dense_0"]["kernel"])
    w_neigh = np.asarray(params["params"]["Dense_1"]["kernel"])
    b = np.asarray(params["params"]["Dense_1"]["bias"])
    neigh = np.asarray(blk.neigh)
    wts = np.asarray(blk.weights)
    for i in range(int(blk.num_dst)):
        sel = neigh[i] != EMPTY_KEY
        ids, w = neigh[i][sel], wts[i][sel]
        mean = (
            (h[ids] * w[:, None]).sum(0) / w.sum()
            if sel.any()
            else np.zeros(8, np.float32)
        )
        exp = h[i] @ w_self + mean @ w_neigh + b
        np.testing.assert_allclose(out[i], exp, rtol=1e-4, atol=1e-5)


def test_gcn_conv_oracle(rng):
    blk = make_block(rng)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    conv = GCNConv(out_dim=6)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    out = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    w = np.asarray(params["params"]["Dense_0"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    neigh = np.asarray(blk.neigh)
    out_deg = np.zeros(32)
    for i in range(16):
        for j in neigh[i][neigh[i] != EMPTY_KEY]:
            out_deg[j] += 1
    hw = h @ w
    hw_n = hw / np.sqrt(np.maximum(out_deg, 1.0))[:, None]
    for i in range(int(blk.num_dst)):
        ids = neigh[i][neigh[i] != EMPTY_KEY]
        agg = hw_n[ids].sum(0) if len(ids) else np.zeros(6, np.float32)
        exp = agg / np.sqrt(max(len(ids), 1)) + b
        np.testing.assert_allclose(out[i], exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("heads", [1, 2])
def test_gat_conv_oracle(rng, heads):
    blk = make_block(rng)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    conv = GATConv(out_dim=6, num_heads=heads)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    out = np.asarray(conv.apply(params, blk, jnp.asarray(h)))
    assert out.shape == (16, heads * 6)

    w = np.asarray(params["params"]["Dense_0"]["kernel"])
    al = np.asarray(params["params"]["attn_l"])
    ar = np.asarray(params["params"]["attn_r"])
    feat = (h @ w).reshape(32, heads, 6)
    el = (feat * al).sum(-1)
    er = (feat * ar).sum(-1)
    neigh = np.asarray(blk.neigh)
    for i in range(int(blk.num_dst)):
        ids = neigh[i][neigh[i] != EMPTY_KEY]
        if len(ids) == 0:
            np.testing.assert_allclose(out[i], 0.0, atol=1e-6)
            continue
        for hd in range(heads):
            e = leaky_relu(el[i, hd] + er[ids, hd])
            a = np.exp(e - e.max())
            a /= a.sum()
            exp = (feat[ids, hd] * a[:, None]).sum(0)
            np.testing.assert_allclose(
                out[i, hd * 6 : (hd + 1) * 6], exp, rtol=1e-4, atol=1e-5
            )


def test_gnn_stack_shapes(rng):
    blk0 = make_block(rng, num_dst=20, num_src=32, dst_cap=24, src_cap=32)
    blk1 = make_block(rng, num_dst=8, num_src=20, dst_cap=12, src_cap=24)
    x = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    for conv in ("graphsage", "gcn", "gat"):
        model = GNN(conv=conv, hidden_dim=16, out_dim=5, num_layers=2, num_heads=2)
        params = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, [blk0, blk1], x, False)
        out = model.apply(params, [blk0, blk1], x, False)
        assert out.shape == (12, 5)
        assert np.all(np.isfinite(np.asarray(out)))
