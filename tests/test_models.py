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


def test_gcn_conv_aggregate_first_oracle(rng):
    """out_dim >= in_dim selects the aggregate-first order (matmul after the
    neighbor sum); the result must match the same transform-first math —
    per-row scaling and the masked sum commute with the right-matmul."""
    blk = make_block(rng)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    conv = GCNConv(out_dim=12)  # 8 -> 12: aggregate-first branch
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    out = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    w = np.asarray(params["params"]["Dense_0"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    neigh = np.asarray(blk.neigh)
    out_deg = np.zeros(32)
    for i in range(16):
        for j in neigh[i][neigh[i] != EMPTY_KEY]:
            out_deg[j] += 1
    hw = h @ w  # transform-first oracle: mathematically identical
    hw_n = hw / np.sqrt(np.maximum(out_deg, 1.0))[:, None]
    for i in range(int(blk.num_dst)):
        ids = neigh[i][neigh[i] != EMPTY_KEY]
        agg = hw_n[ids].sum(0) if len(ids) else np.zeros(12, np.float32)
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

    # heads=1 exercises the transform-first branch (8 > 1*6), heads=2 the
    # aggregate-first branch (8 <= 2*6); the oracle math is order-free
    w = np.asarray(params["params"]["kernel"]).reshape(8, heads * 6)
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


def test_gat_conv_acc_limit_per_pick_transform(rng):
    """``acc_limit=0`` forces the per-pick-transform fallback (the (dst, H·D)
    accumulator used when the aggregate-first (dst, H, in) accumulator would
    exceed HBM); it must match the aggregate-first output bit-for-nearly."""
    blk = make_block(rng)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    big = GATConv(out_dim=6, num_heads=2)  # 8 <= 2*6: aggregate-first
    params = big.init(jax.random.key(0), blk, jnp.asarray(h))
    ref = np.asarray(big.apply(params, blk, jnp.asarray(h)))
    # acc_limit=0 + big mat_limit → the (dst, K, in) contraction form;
    # acc_limit=0 + mat_limit=0 → the per-pick-transform loop
    variants = {
        "contraction": GATConv(out_dim=6, num_heads=2, acc_limit=0),
        "per_pick": GATConv(out_dim=6, num_heads=2, acc_limit=0, mat_limit=0),
    }
    for name, small in variants.items():
        out = np.asarray(small.apply(params, blk, jnp.asarray(h)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6, err_msg=name)

    # the bench trains through these paths: gradients must agree too
    def loss(conv, p):
        o = conv.apply(p, blk, jnp.asarray(h))
        return jnp.sum(o[: int(blk.num_dst)] ** 2)

    g_ref = jax.grad(lambda p: loss(big, p))(params)["params"]
    for name, small in variants.items():
        g_out = jax.grad(lambda p: loss(small, p))(params)["params"]
        for k in ("kernel", "attn_l", "attn_r"):
            np.testing.assert_allclose(
                np.asarray(g_out[k]), np.asarray(g_ref[k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{name}:{k}",
            )


def test_gat_conv_bf16_activations_close_to_f32(rng):
    """bf16 activations route every GAT matmul through the mixed-precision
    dot (bf16 MXU operands, f32 accumulation) — all three branches must stay
    within bf16 rounding of the f32 result, and output dtype stays f32."""
    blk = make_block(rng)
    h = rng.standard_normal((32, 8)).astype(np.float32)
    for heads, acc_limit in ((1, None), (2, None), (2, 0)):
        kw = {} if acc_limit is None else {"acc_limit": acc_limit}
        conv = GATConv(out_dim=6, num_heads=heads, **kw)
        params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
        ref = np.asarray(conv.apply(params, blk, jnp.asarray(h)))
        out_bf = conv.apply(params, blk, jnp.asarray(h, jnp.bfloat16))
        assert out_bf.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out_bf), ref, rtol=3e-2, atol=3e-2
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


def test_full_graph_inference_oracle(tiny_ds):
    """spmm_csr + layer-wise inference vs a NumPy full-neighbor oracle."""
    import jax
    import jax.numpy as jnp
    from xgnn_tpu.inference import full_graph_inference
    from xgnn_tpu.ops.spmm import spmm_csr

    ds = tiny_ds
    indptr, indices = jnp.asarray(ds.indptr), jnp.asarray(ds.indices)
    h = jnp.asarray(ds.feat)

    # spmm oracle
    agg = np.asarray(spmm_csr(indptr, indices, h, num_node=ds.num_node,
                              chunk=64, mean=True))
    for v in range(ds.num_node):
        ns = ds.indices[ds.indptr[v]:ds.indptr[v+1]]
        exp = ds.feat[ns].mean(0) if len(ns) else np.zeros(ds.feat_dim)
        np.testing.assert_allclose(agg[v], exp, rtol=1e-4, atol=1e-5)

    # layer-wise inference vs manual per-node computation (graphsage)
    model = GNN(conv="graphsage", hidden_dim=8, out_dim=4, num_layers=2)
    blk = make_block(np.random.default_rng(0))
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        [blk, blk], jnp.asarray(ds.feat[:32]), False,
    )["params"]
    logits = np.asarray(
        full_graph_inference(model, params, indptr, indices, h)
    )
    assert logits.shape == (ds.num_node, 4)
    # manual oracle for node 0
    p0, p1 = params["SAGEConv_0"], params["SAGEConv_1"]

    def sage_layer(p, hh, mean_nb):
        return hh @ np.asarray(p["Dense_0"]["kernel"]) + \
               mean_nb @ np.asarray(p["Dense_1"]["kernel"]) + \
               np.asarray(p["Dense_1"]["bias"])

    feat = ds.feat
    mean_all = np.stack([
        feat[ds.indices[ds.indptr[v]:ds.indptr[v+1]]].mean(0)
        if ds.indptr[v+1] > ds.indptr[v] else np.zeros(ds.feat_dim)
        for v in range(ds.num_node)
    ])
    h1 = np.maximum(sage_layer(p0, feat, mean_all), 0)
    v = 0
    ns = ds.indices[ds.indptr[v]:ds.indptr[v+1]]
    mean1 = h1[ns].mean(0) if len(ns) else np.zeros_like(h1[0])
    exp = sage_layer(p1, h1[v], mean1)
    np.testing.assert_allclose(logits[v], exp, rtol=1e-3, atol=1e-4)


def test_gat_full_graph_inference_oracle(tiny_ds):
    """Full-neighbor GAT aggregation (SDDMM+edge-softmax+SpMM scan) vs a
    per-node NumPy oracle."""
    import jax
    import jax.numpy as jnp
    from xgnn_tpu.ops.spmm import gat_aggregate_csr

    ds = tiny_ds
    rng = np.random.default_rng(2)
    H, D = 2, 4
    feat = rng.standard_normal((ds.num_node, H, D)).astype(np.float32)
    el = rng.standard_normal((ds.num_node, H)).astype(np.float32)
    er = rng.standard_normal((ds.num_node, H)).astype(np.float32)
    out = np.asarray(
        gat_aggregate_csr(
            jnp.asarray(ds.indptr), jnp.asarray(ds.indices),
            jnp.asarray(feat), jnp.asarray(el), jnp.asarray(er),
            num_node=ds.num_node, chunk=128,
        )
    )
    for v in range(0, ds.num_node, 7):
        ns = ds.indices[ds.indptr[v]:ds.indptr[v+1]]
        if len(ns) == 0:
            continue
        for hd in range(H):
            e = leaky_relu(el[v, hd] + er[ns, hd])
            a = np.exp(e - e.max()); a /= a.sum()
            exp = (feat[ns, hd] * a[:, None]).sum(0)
            np.testing.assert_allclose(out[v, hd], exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("conv", ["graphsage", "gcn", "pinsage"])
def test_agg_impl_tiled_matches_loop(rng, conv):
    """agg_impl="tiled" (ops/fanout custom-VJP path) is numerically
    equivalent to the unrolled-loop formulation, values and grads."""
    blocks = [
        make_block(rng, num_dst=20, num_src=60, fanout=5, dst_cap=32,
                   src_cap=64, weighted=(conv == "pinsage")),
        make_block(rng, num_dst=8, num_src=20, fanout=3, dst_cap=16,
                   src_cap=32, weighted=(conv == "pinsage")),
    ]
    x = jnp.asarray(rng.normal(size=(64, 12)).astype(np.float32))
    models = {
        impl: GNN(conv=conv, hidden_dim=16, out_dim=5, num_layers=2,
                  dropout=0.0, agg_impl=impl)
        for impl in ("loop", "tiled")
    }
    params = models["loop"].init(
        {"params": jax.random.key(0)}, blocks, x, False
    )["params"]

    outs, grads = {}, {}
    for impl, m in models.items():
        def loss(p):
            return jnp.sum(jnp.tanh(m.apply({"params": p}, blocks, x, False)))
        outs[impl], grads[impl] = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(outs["tiled"]), float(outs["loop"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads["tiled"]),
                    jax.tree.leaves(grads["loop"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_spmm_planned_matches_edge_scatter():
    """Degree-bucketed SpMM (gather+reduce plan) == edge-scatter spmm_csr,
    including hub splitting (max_cap forced tiny so high-degree nodes span
    multiple tasks) and the mean path."""
    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu import synthetic
    from xgnn_tpu.ops.spmm import (
        build_spmm_plan,
        spmm_csr,
        spmm_csr_planned,
    )

    ds = synthetic.make_synthetic_dataset(
        num_node=1500, avg_degree=9, feat_dim=24, num_class=4, seed=1
    )
    h = np.random.default_rng(0).standard_normal(
        (ds.num_node, 24)
    ).astype(np.float32)
    ref = spmm_csr(
        jnp.asarray(ds.indptr), jnp.asarray(ds.indices), jnp.asarray(h),
        num_node=ds.num_node,
    )
    refm = spmm_csr(
        jnp.asarray(ds.indptr), jnp.asarray(ds.indices), jnp.asarray(h),
        num_node=ds.num_node, mean=True,
    )
    deg = np.diff(ds.indptr)
    assert deg.max() > 8  # the tiny cap below must actually split hubs
    inv = jnp.asarray(
        np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0).astype(np.float32)
    )
    for cap in (8, 2048):
        plan, meta = build_spmm_plan(ds.indptr, max_cap=cap)
        got = spmm_csr_planned(
            plan, meta, jnp.asarray(ds.indices), jnp.asarray(h)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        gotm = spmm_csr_planned(
            plan, meta, jnp.asarray(ds.indices), jnp.asarray(h),
            mean=True, inv_deg=inv,
        )
        np.testing.assert_allclose(
            np.asarray(gotm), np.asarray(refm), rtol=2e-5, atol=2e-5
        )
        # pre-expanded neighbor-id path (materialize_plan_ids — the
        # inference default) must match exactly
        from xgnn_tpu.ops.spmm import materialize_plan_ids

        materialize_plan_ids(plan, meta, jnp.asarray(ds.indices), ds.num_node)
        got_pre = spmm_csr_planned(
            plan, meta, jnp.asarray(ds.indices), jnp.asarray(h)
        )
        np.testing.assert_array_equal(np.asarray(got_pre), np.asarray(got))
        gotm_pre = spmm_csr_planned(
            plan, meta, jnp.asarray(ds.indices), jnp.asarray(h),
            mean=True, inv_deg=inv,
        )
        np.testing.assert_array_equal(np.asarray(gotm_pre), np.asarray(gotm))


def test_gat_aggregate_planned_matches_edge_scatter():
    """Bucketed two-pass segment softmax == edge-scatter gat_aggregate_csr,
    incl. hub splitting (cross-task max/sum must stay exact) and multi-head."""
    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu import synthetic
    from xgnn_tpu.ops.spmm import (
        build_spmm_plan,
        gat_aggregate_csr,
        gat_aggregate_planned,
    )

    ds = synthetic.make_synthetic_dataset(
        num_node=1200, avg_degree=9, feat_dim=16, num_class=4, seed=3
    )
    rng = np.random.default_rng(0)
    for heads, d in ((1, 16), (4, 8)):
        feat = rng.standard_normal(
            (ds.num_node, heads, d)
        ).astype(np.float32)
        el = rng.standard_normal((ds.num_node, heads)).astype(np.float32)
        er = rng.standard_normal((ds.num_node, heads)).astype(np.float32)
        ref = gat_aggregate_csr(
            jnp.asarray(ds.indptr), jnp.asarray(ds.indices),
            jnp.asarray(feat), jnp.asarray(el), jnp.asarray(er),
            num_node=ds.num_node,
        )
        for cap in (8, 2048):
            plan, meta = build_spmm_plan(ds.indptr, max_cap=cap)
            got = gat_aggregate_planned(
                plan, meta, jnp.asarray(ds.indices), jnp.asarray(feat),
                jnp.asarray(el), jnp.asarray(er),
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5
            )
            from xgnn_tpu.ops.spmm import materialize_plan_ids

            materialize_plan_ids(
                plan, meta, jnp.asarray(ds.indices), ds.num_node
            )
            got_pre = gat_aggregate_planned(
                plan, meta, jnp.asarray(ds.indices), jnp.asarray(feat),
                jnp.asarray(el), jnp.asarray(er),
            )
            np.testing.assert_array_equal(
                np.asarray(got_pre), np.asarray(got)
            )


def test_spmm_planned_src_block_tiling_matches():
    """Source-blocked plan (adjacency sorted per node, runs split at
    src-block boundaries, tasks block-major) == unblocked plan == edge
    scatter — sum, mean, and the GAT two-pass softmax.  Exercises tiny
    blocks (every run splits) and hub splitting on top of block splits."""
    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu import synthetic
    from xgnn_tpu.ops.spmm import (
        build_spmm_plan,
        gat_aggregate_csr,
        gat_aggregate_planned,
        spmm_csr,
        spmm_csr_planned,
    )

    ds = synthetic.make_synthetic_dataset(
        num_node=1500, avg_degree=9, feat_dim=24, num_class=4, seed=1
    )
    rng = np.random.default_rng(0)
    h = rng.standard_normal((ds.num_node, 24)).astype(np.float32)
    ref = spmm_csr(
        jnp.asarray(ds.indptr), jnp.asarray(ds.indices), jnp.asarray(h),
        num_node=ds.num_node,
    )
    deg = np.diff(ds.indptr)
    inv = jnp.asarray(
        np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0).astype(np.float32)
    )
    refm = spmm_csr(
        jnp.asarray(ds.indptr), jnp.asarray(ds.indices), jnp.asarray(h),
        num_node=ds.num_node, mean=True,
    )
    for blk, cap in ((64, 8), (64, 2048), (500, 2048)):
        plan, meta = build_spmm_plan(
            ds.indptr, max_cap=cap, indices=ds.indices, src_block=blk
        )
        idx = jnp.asarray(meta["indices"])
        # the reordered edges are a per-node permutation of the originals
        assert meta["indices"].shape[0] == ds.indices.shape[0]
        got = spmm_csr_planned(plan, meta, idx, jnp.asarray(h))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        gotm = spmm_csr_planned(
            plan, meta, idx, jnp.asarray(h), mean=True, inv_deg=inv
        )
        np.testing.assert_allclose(
            np.asarray(gotm), np.asarray(refm), rtol=2e-5, atol=2e-5
        )

    feat = rng.standard_normal((ds.num_node, 2, 12)).astype(np.float32)
    el = rng.standard_normal((ds.num_node, 2)).astype(np.float32)
    er = rng.standard_normal((ds.num_node, 2)).astype(np.float32)
    gref = gat_aggregate_csr(
        jnp.asarray(ds.indptr), jnp.asarray(ds.indices),
        jnp.asarray(feat), jnp.asarray(el), jnp.asarray(er),
        num_node=ds.num_node,
    )
    plan, meta = build_spmm_plan(
        ds.indptr, max_cap=16, indices=ds.indices, src_block=200
    )
    got = gat_aggregate_planned(
        plan, meta, jnp.asarray(meta["indices"]), jnp.asarray(feat),
        jnp.asarray(el), jnp.asarray(er),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(gref), rtol=3e-5, atol=3e-5
    )


def test_spmm_planned_fine_buckets_matches():
    """fine_buckets=True (3*2^k midpoint caps) == pow2 plan == edge scatter;
    also covers a non-pow2 max_cap top bucket."""
    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu import synthetic
    from xgnn_tpu.ops.spmm import build_spmm_plan, spmm_csr, spmm_csr_planned

    ds = synthetic.make_synthetic_dataset(
        num_node=1500, avg_degree=9, feat_dim=24, num_class=4, seed=1
    )
    h = np.random.default_rng(0).standard_normal(
        (ds.num_node, 24)
    ).astype(np.float32)
    ref = spmm_csr(
        jnp.asarray(ds.indptr), jnp.asarray(ds.indices), jnp.asarray(h),
        num_node=ds.num_node,
    )
    for cap in (7, 12, 2048):
        plan, meta = build_spmm_plan(ds.indptr, max_cap=cap,
                                     fine_buckets=True)
        assert sum(len(b["lens"]) for b in plan) >= ds.num_node - 1
        got = spmm_csr_planned(
            plan, meta, jnp.asarray(ds.indices), jnp.asarray(h)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_gat_bytes_model_path_selection():
    """The default (acc_limit=None) bytes model reproduces the chip-measured
    optimal path at every bench-shape layer (PERF.md GAT A/B anchors), and
    the explicit-int override keeps the old threshold semantics."""
    from xgnn_tpu.models.gnn import gat_select_path

    MAT = 1_200_000_000
    # 8-head bench shapes (heads=8, hidden 256 -> d=32):
    # layer 0: dst 1M, K 15, in 128 — picks buffer 1.92G > MAT -> per_pick
    assert gat_select_path(1_007_360, 15, 128, 8, 32, None, MAT) == "per_pick"
    # middle layer: dst 133k, K 10, in 256 — the measured +11.6% contraction
    assert gat_select_path(133_376, 10, 256, 8, 32, None, MAT) == "contraction"
    # 1-head layers: aggregate-first measured best (fanout_bench.tsv)
    assert gat_select_path(1_007_360, 15, 128, 1, 256, None, MAT) == "aggregate_first"
    assert gat_select_path(133_376, 10, 256, 1, 256, None, MAT) == "aggregate_first"
    # explicit int override: old element-count threshold
    assert gat_select_path(100, 4, 8, 2, 6, 0, MAT) == "contraction"
    assert gat_select_path(100, 4, 8, 2, 6, 0, 0) == "per_pick"
    assert gat_select_path(100, 4, 8, 2, 6, 10**9, MAT) == "aggregate_first"


def test_fanout_reduce_chunk_matches_loop(rng):
    """impl="chunk" (statically-unrolled chunked gather+reduce) must match
    the loop impl exactly, with and without weights."""
    from xgnn_tpu.models.gnn import fanout_reduce

    blk = make_block(rng)
    h = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    w = jnp.asarray(rng.random((blk.neigh.shape)).astype(np.float32))
    for weights in (None, w):
        s0, d0 = fanout_reduce(h, blk, weights, impl="loop")
        for impl in ("chunk", "chunk2", "chunk5"):
            s1, d1 = fanout_reduce(h, blk, weights, impl=impl)
            np.testing.assert_allclose(
                np.asarray(s1), np.asarray(s0), rtol=1e-6, atol=1e-6,
                err_msg=impl,
            )
            np.testing.assert_allclose(
                np.asarray(d1), np.asarray(d0), rtol=1e-6, atol=1e-6,
            )
