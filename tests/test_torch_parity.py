"""Independent-framework parity: PyTorch (CPU) re-implementation of the DGL
layer semantics vs the flax models, same weights, allclose outputs.

This is the BASELINE.json "per-layer allclose vs DGL" north star re-scoped
for an egress-free environment: DGL itself is not installable here, but
torch is — so the oracle is a from-scratch torch implementation of DGL's
``SAGEConv('mean')`` / ``GraphConv`` math (the layers the reference trains,
``example/samgraph/sgnn/train_gcn.py:18-46``), exercised on real sampled
blocks.  A torch autograd pass also cross-checks our gradient path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xgnn_tpu.constants import EMPTY_KEY  # noqa: E402
from xgnn_tpu.models import GATConv, GCNConv, PinSAGEConv, SAGEConv  # noqa: E402
from xgnn_tpu.types import Block  # noqa: E402


def _random_block(rng, num_dst, num_src, fanout, dst_cap, src_cap):
    neigh = np.full((dst_cap, fanout), EMPTY_KEY, np.int32)
    for i in range(num_dst):
        k = rng.integers(1, fanout + 1)
        neigh[i, :k] = rng.integers(0, num_src, k)
    return Block(
        neigh=jnp.asarray(neigh),
        num_dst=jnp.int32(num_dst),
        num_src=jnp.int32(num_src),
    )


def _torch_mean_agg(h_src, neigh, num_dst):
    """DGL mean aggregation over the dense fanout block, in torch."""
    n = torch.from_numpy(np.asarray(neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    rows = h_src[safe]  # (dst_cap, K, F)
    rows = rows * mask.unsqueeze(-1)
    denom = mask.sum(1, keepdim=True).clamp(min=1)
    return rows.sum(1) / denom


def test_sage_forward_parity(rng):
    blk = _random_block(rng, num_dst=20, num_src=60, fanout=5,
                        dst_cap=32, src_cap=64)
    h = rng.standard_normal((64, 16)).astype(np.float32)
    conv = SAGEConv(out_dim=8)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    ours = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    # torch twin of DGL SAGEConv('mean'): W_self h_dst + W_neigh mean(h_N)
    w_self = torch.from_numpy(np.asarray(params["params"]["Dense_0"]["kernel"]))
    w_neigh = torch.from_numpy(np.asarray(params["params"]["Dense_1"]["kernel"]))
    b = torch.from_numpy(np.asarray(params["params"]["Dense_1"]["bias"]))
    ht = torch.from_numpy(h)
    mean = _torch_mean_agg(ht, blk.neigh, int(blk.num_dst))
    theirs = ht[: mean.shape[0]] @ w_self + mean @ w_neigh + b

    nd = int(blk.num_dst)
    np.testing.assert_allclose(
        ours[:nd], theirs.numpy()[:nd], rtol=1e-4, atol=1e-5
    )


def test_gcn_forward_parity(rng):
    blk = _random_block(rng, num_dst=20, num_src=60, fanout=5,
                        dst_cap=32, src_cap=64)
    h = rng.standard_normal((64, 16)).astype(np.float32)
    conv = GCNConv(out_dim=8)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    ours = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    # torch twin of DGL GraphConv(norm='both') on a sampled block:
    # h' = D_dst^{-1/2} (A @ (D_src^{-1/2} h W)) + b, with the sampled
    # block's in-degree as D_dst and fanout-occurrence count as D_src
    w = torch.from_numpy(np.asarray(params["params"]["Dense_0"]["kernel"]))
    b = torch.from_numpy(np.asarray(params["params"]["bias"]))
    ht = torch.from_numpy(h)
    n = torch.from_numpy(np.asarray(blk.neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    # out-degree of each src node within the block (how many sampled edges
    # it participates in)
    out_deg = torch.zeros(h.shape[0])
    out_deg.scatter_add_(
        0, safe.reshape(-1), mask.reshape(-1).float()
    )
    hw = ht @ w
    hw_norm = hw / out_deg.clamp(min=1).sqrt().unsqueeze(-1)
    msgs = hw_norm[safe] * mask.unsqueeze(-1)
    agg = msgs.sum(1)
    in_deg = mask.sum(1).float()
    theirs = agg / in_deg.clamp(min=1).sqrt().unsqueeze(-1) + b

    nd = int(blk.num_dst)
    np.testing.assert_allclose(
        ours[:nd], theirs.numpy()[:nd], rtol=1e-4, atol=1e-5
    )


def test_pinsage_forward_parity(rng):
    """PinSAGE = SAGE with visit-count edge weights from the random-walk
    sampler (reference ``TrainGraph::data``); torch twin uses a weighted
    mean over the dense fanout block."""
    blk = _random_block(rng, num_dst=20, num_src=60, fanout=5,
                        dst_cap=32, src_cap=64)
    wts = (rng.random((32, 5)).astype(np.float32) + 0.5) * np.asarray(
        blk.neigh != EMPTY_KEY
    )
    blk = Block(neigh=blk.neigh, num_dst=blk.num_dst, num_src=blk.num_src,
                weights=jnp.asarray(wts))
    h = rng.standard_normal((64, 16)).astype(np.float32)
    conv = PinSAGEConv(out_dim=8)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    ours = np.asarray(conv.apply(params, blk, jnp.asarray(h)))

    w_self = torch.from_numpy(np.asarray(params["params"]["Dense_0"]["kernel"]))
    w_neigh = torch.from_numpy(np.asarray(params["params"]["Dense_1"]["kernel"]))
    b = torch.from_numpy(np.asarray(params["params"]["Dense_1"]["bias"]))
    ht = torch.from_numpy(h)
    n = torch.from_numpy(np.asarray(blk.neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    w = torch.from_numpy(wts) * mask
    rows = ht[safe] * w.unsqueeze(-1)
    mean = rows.sum(1) / w.sum(1, keepdim=True).clamp(min=1e-9)
    theirs = ht[: mean.shape[0]] @ w_self + mean @ w_neigh + b

    nd = int(blk.num_dst)
    np.testing.assert_allclose(
        ours[:nd], theirs.numpy()[:nd], rtol=1e-4, atol=1e-5
    )


def _torch_gat(params, h, neigh, heads, out_dim, slope=0.2):
    """Torch twin of DGL GATConv on a dense-fanout block, written the
    CANONICAL way (transform every src row, then attend) — the flax layer
    folds the attention projections into the kernel and reorders the
    transform around the aggregation (models/gnn.py GATConv), so agreement
    here checks both algebraic rewrites against torch autograd-able math."""
    in_dim = h.shape[1]
    kernel = torch.from_numpy(np.asarray(params["kernel"]))  # (in, H, D)
    attn_l = torch.from_numpy(np.asarray(params["attn_l"]))  # (H, D)
    attn_r = torch.from_numpy(np.asarray(params["attn_r"]))
    ht = torch.from_numpy(h)
    z = (ht @ kernel.reshape(in_dim, heads * out_dim)).reshape(
        -1, heads, out_dim
    )
    el = (z * attn_l).sum(-1)  # (src, H) — dst-side score term
    er = (z * attn_r).sum(-1)  # (src, H) — neighbor-side score term
    n = torch.from_numpy(np.asarray(neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    dst_cap = n.shape[0]
    e = el[:dst_cap].unsqueeze(1) + er[safe]  # (dst, K, H)
    e = torch.nn.functional.leaky_relu(e, slope)
    e = torch.where(mask.unsqueeze(-1), e, torch.full_like(e, -torch.inf))
    a = torch.softmax(e, dim=1)
    a = torch.nan_to_num(a) * mask.unsqueeze(-1)
    out = (z[safe] * a.unsqueeze(-1)).sum(1)  # (dst, H, D)
    return out.reshape(dst_cap, heads * out_dim)


@pytest.mark.parametrize(
    "heads,out_dim",
    [
        (4, 8),  # in_dim 16 <= H*D 32: the aggregate-first fast path
        (2, 4),  # in_dim 16 >  H*D 8: the transform-first path
    ],
)
def test_gat_forward_parity(rng, heads, out_dim):
    blk = _random_block(rng, num_dst=20, num_src=60, fanout=5,
                        dst_cap=32, src_cap=64)
    h = rng.standard_normal((64, 16)).astype(np.float32)
    conv = GATConv(out_dim=out_dim, num_heads=heads)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))
    ours = np.asarray(conv.apply(params, blk, jnp.asarray(h)))
    theirs = _torch_gat(params["params"], h, blk.neigh, heads, out_dim)
    nd = int(blk.num_dst)
    np.testing.assert_allclose(
        ours[:nd], theirs.numpy()[:nd], rtol=1e-4, atol=1e-5
    )


def test_sage_gradient_parity(rng):
    """Loss gradients w.r.t. the layer weights match torch autograd."""
    blk = _random_block(rng, num_dst=12, num_src=40, fanout=4,
                        dst_cap=16, src_cap=48)
    h = rng.standard_normal((48, 8)).astype(np.float32)
    conv = SAGEConv(out_dim=4)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))

    def loss_fn(p):
        out = conv.apply(p, blk, jnp.asarray(h))
        return jnp.sum(out[: int(blk.num_dst)] ** 2)

    grads = jax.grad(loss_fn)(params)["params"]

    w_self = torch.from_numpy(
        np.asarray(params["params"]["Dense_0"]["kernel"])
    ).requires_grad_()
    w_neigh = torch.from_numpy(
        np.asarray(params["params"]["Dense_1"]["kernel"])
    ).requires_grad_()
    b = torch.from_numpy(
        np.asarray(params["params"]["Dense_1"]["bias"])
    ).requires_grad_()
    ht = torch.from_numpy(h)
    mean = _torch_mean_agg(ht, blk.neigh, int(blk.num_dst))
    out = ht[: mean.shape[0]] @ w_self + mean @ w_neigh + b
    loss = (out[: int(blk.num_dst)] ** 2).sum()
    loss.backward()

    np.testing.assert_allclose(
        np.asarray(grads["Dense_0"]["kernel"]), w_self.grad.numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(grads["Dense_1"]["kernel"]), w_neigh.grad.numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(grads["Dense_1"]["bias"]), b.grad.numpy(),
        rtol=1e-3, atol=1e-4,
    )


def test_gcn_gradient_parity(rng):
    """GCN (aggregate-first reordered path) gradients vs torch autograd —
    the reorder ``agg(norm·h)W == agg(norm·(hW))`` must hold in the VJP."""
    blk = _random_block(rng, num_dst=12, num_src=40, fanout=4,
                        dst_cap=16, src_cap=48)
    h = rng.standard_normal((48, 8)).astype(np.float32)
    conv = GCNConv(out_dim=4)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))

    def loss_fn(p):
        out = conv.apply(p, blk, jnp.asarray(h))
        return jnp.sum(out[: int(blk.num_dst)] ** 2)

    grads = jax.grad(loss_fn)(params)["params"]

    w = torch.from_numpy(
        np.asarray(params["params"]["Dense_0"]["kernel"])
    ).requires_grad_()
    b = torch.from_numpy(
        np.asarray(params["params"]["bias"])
    ).requires_grad_()
    ht = torch.from_numpy(h)
    n = torch.from_numpy(np.asarray(blk.neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    out_deg = torch.zeros(h.shape[0])
    out_deg.scatter_add_(0, safe.reshape(-1), mask.reshape(-1).float())
    hw = ht @ w
    hw_norm = hw / out_deg.clamp(min=1).sqrt().unsqueeze(-1)
    msgs = hw_norm[safe] * mask.unsqueeze(-1)
    agg = msgs.sum(1)
    in_deg = mask.sum(1).float()
    out = agg / in_deg.clamp(min=1).sqrt().unsqueeze(-1) + b
    (out[: int(blk.num_dst)] ** 2).sum().backward()

    np.testing.assert_allclose(
        np.asarray(grads["Dense_0"]["kernel"]), w.grad.numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(grads["bias"]), b.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_pinsage_gradient_parity(rng):
    """PinSAGE (visit-weighted mean) gradients vs torch autograd."""
    blk = _random_block(rng, num_dst=12, num_src=40, fanout=4,
                        dst_cap=16, src_cap=48)
    wts = (rng.random((16, 4)).astype(np.float32) + 0.5) * np.asarray(
        blk.neigh != EMPTY_KEY
    )
    from xgnn_tpu.types import Block as _B

    blk = _B(neigh=blk.neigh, num_dst=blk.num_dst, num_src=blk.num_src,
             weights=jnp.asarray(wts))
    h = rng.standard_normal((48, 8)).astype(np.float32)
    conv = PinSAGEConv(out_dim=4)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))

    def loss_fn(p):
        out = conv.apply(p, blk, jnp.asarray(h))
        return jnp.sum(out[: int(blk.num_dst)] ** 2)

    grads = jax.grad(loss_fn)(params)["params"]

    w_self = torch.from_numpy(
        np.asarray(params["params"]["Dense_0"]["kernel"])
    ).requires_grad_()
    w_neigh = torch.from_numpy(
        np.asarray(params["params"]["Dense_1"]["kernel"])
    ).requires_grad_()
    b = torch.from_numpy(
        np.asarray(params["params"]["Dense_1"]["bias"])
    ).requires_grad_()
    ht = torch.from_numpy(h)
    n = torch.from_numpy(np.asarray(blk.neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    wt = torch.from_numpy(wts) * mask
    rows = ht[safe] * wt.unsqueeze(-1)
    mean = rows.sum(1) / wt.sum(1, keepdim=True).clamp(min=1e-9)
    out = ht[: mean.shape[0]] @ w_self + mean @ w_neigh + b
    (out[: int(blk.num_dst)] ** 2).sum().backward()

    for got, want in (
        (grads["Dense_0"]["kernel"], w_self.grad),
        (grads["Dense_1"]["kernel"], w_neigh.grad),
        (grads["Dense_1"]["bias"], b.grad),
    ):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-4
        )


def _torch_gat_loss(params_np, h, neigh, heads, out_dim, num_dst):
    """Autograd-able torch GAT twin: returns (loss, {name: grad})."""
    in_dim = h.shape[1]
    kernel = torch.from_numpy(params_np["kernel"]).requires_grad_()
    attn_l = torch.from_numpy(params_np["attn_l"]).requires_grad_()
    attn_r = torch.from_numpy(params_np["attn_r"]).requires_grad_()
    ht = torch.from_numpy(h)
    z = (ht @ kernel.reshape(in_dim, heads * out_dim)).reshape(
        -1, heads, out_dim
    )
    el = (z * attn_l).sum(-1)
    er = (z * attn_r).sum(-1)
    n = torch.from_numpy(np.asarray(neigh))
    mask = n != EMPTY_KEY
    safe = torch.where(mask, n, torch.zeros_like(n)).long()
    dst_cap = n.shape[0]
    e = el[:dst_cap].unsqueeze(1) + er[safe]
    e = torch.nn.functional.leaky_relu(e, 0.2)
    e = torch.where(mask.unsqueeze(-1), e, torch.full_like(e, -torch.inf))
    a = torch.softmax(e, dim=1)
    a = torch.nan_to_num(a) * mask.unsqueeze(-1)
    out = (z[safe] * a.unsqueeze(-1)).sum(1).reshape(dst_cap, heads * out_dim)
    loss = (out[:num_dst] ** 2).sum()
    loss.backward()
    return {
        "kernel": kernel.grad.numpy(),
        "attn_l": attn_l.grad.numpy(),
        "attn_r": attn_r.grad.numpy(),
    }


@pytest.mark.parametrize(
    "heads,out_dim,acc_limit,mat_limit,path",
    [
        (1, 8, 10**9, 10**9, "aggregate-first"),   # in 8 <= H*D 8
        (8, 8, 10**9, 10**9, "aggregate-first"),   # multi-head
        (8, 8, 0, 10**9, "contraction"),           # forced contraction
        (8, 8, 0, 0, "per-pick-transform"),        # forced per-pick
        (1, 2, 10**9, 10**9, "transform-first"),   # in 8 > H*D 2
        (8, 8, 0, 10**9, "contraction-again"),
    ],
)
def test_gat_gradient_parity(rng, heads, out_dim, acc_limit, mat_limit, path):
    """GAT gradients vs torch autograd through EVERY execution path — the
    online-softmax stop_gradient telescoping (models/gnn.py _online_attend)
    and the folded attention projections are exactly where a VJP bug hides
    (VERDICT round-2 item 4)."""
    blk = _random_block(rng, num_dst=12, num_src=40, fanout=4,
                        dst_cap=16, src_cap=48)
    h = rng.standard_normal((48, 8)).astype(np.float32)
    conv = GATConv(out_dim=out_dim, num_heads=heads,
                   acc_limit=acc_limit, mat_limit=mat_limit)
    params = conv.init(jax.random.key(0), blk, jnp.asarray(h))

    def loss_fn(p):
        out = conv.apply(p, blk, jnp.asarray(h))
        return jnp.sum(out[: int(blk.num_dst)] ** 2)

    grads = jax.grad(loss_fn)(params)["params"]
    params_np = {
        k: np.asarray(v) for k, v in params["params"].items()
    }
    want = _torch_gat_loss(
        params_np, h, blk.neigh, heads, out_dim, int(blk.num_dst)
    )
    for name in ("kernel", "attn_l", "attn_r"):
        np.testing.assert_allclose(
            np.asarray(grads[name]), want[name], rtol=2e-3, atol=2e-4,
            err_msg=f"{path}: grad mismatch on {name}",
        )


# --------------------------------------------------------------------------
# End-to-end TRAINING-TRAJECTORY parity (VERDICT r3 item 3): N steps of real
# engine training vs an independent torch twin consuming the exact same
# sampled blocks/features/labels with the same init and the same Adam — loss
# curves must agree step-for-step.  This is the integration-level check the
# per-layer/per-gradient tests cannot provide: a shuffler-order, loss-mask,
# LR-schedule, or update-skipping bug shifts the whole trajectory.
# (Reference pattern: example/train_accuracy.py evaluates through an
# independent DGL pipeline on the same data.)
# --------------------------------------------------------------------------


def _torch_sage_net(params_np, num_layers):
    layers = []
    for i in range(num_layers):
        p = params_np[f"SAGEConv_{i}"]
        layers.append((
            torch.from_numpy(p["Dense_0"]["kernel"]).clone().requires_grad_(),
            torch.from_numpy(p["Dense_1"]["kernel"]).clone().requires_grad_(),
            torch.from_numpy(p["Dense_1"]["bias"]).clone().requires_grad_(),
        ))
    flat = [t for lay in layers for t in lay]

    def forward(blocks_np, x):
        h = x
        for i, (w_self, w_neigh, b) in enumerate(layers):
            neigh = blocks_np[i]
            mean = _torch_mean_agg(h, neigh, neigh.shape[0])
            h = h[: neigh.shape[0]] @ w_self + mean @ w_neigh + b
            if i < num_layers - 1:
                h = torch.relu(h)
        return h

    return forward, flat


def _torch_gcn_net(params_np, num_layers):
    layers = []
    for i in range(num_layers):
        p = params_np[f"GCNConv_{i}"]
        layers.append((
            torch.from_numpy(p["Dense_0"]["kernel"]).clone().requires_grad_(),
            torch.from_numpy(p["bias"]).clone().requires_grad_(),
        ))
    flat = [t for lay in layers for t in lay]

    def forward(blocks_np, x):
        h = x
        for i, (w, b) in enumerate(layers):
            neigh = blocks_np[i]
            n = torch.from_numpy(neigh)
            mask = n != EMPTY_KEY
            safe = torch.where(mask, n, torch.zeros_like(n)).long()
            out_deg = torch.zeros(h.shape[0])
            out_deg.scatter_add_(0, safe.reshape(-1), mask.reshape(-1).float())
            hw = h @ w
            hw_norm = hw / out_deg.clamp(min=1).sqrt().unsqueeze(-1)
            msgs = hw_norm[safe] * mask.unsqueeze(-1)
            agg = msgs.sum(1)
            in_deg = mask.sum(1).float()
            h = agg / in_deg.clamp(min=1).sqrt().unsqueeze(-1) + b
            if i < num_layers - 1:
                h = torch.relu(h)
        return h

    return forward, flat


def _torch_masked_ce(logits, labels, num_valid):
    n = logits.shape[0]
    mask = (torch.arange(n) < num_valid).float()
    safe = labels.clamp(0, logits.shape[1] - 1)
    ll = torch.nn.functional.cross_entropy(logits, safe, reduction="none")
    return (ll * mask).sum() / max(float(num_valid), 1.0)


@pytest.mark.parametrize("model_name", ["graphsage", "gcn"])
def test_training_trajectory_parity(learn_ds, model_name):
    """>=20 steps of the REAL engine loop (shuffler -> sampler -> extract ->
    jitted Adam train step) vs torch Adam on the exported per-step batches:
    loss trajectories allclose, and the engine's own train_epoch() reports
    the same mean loss for the identical epoch."""
    import jax
    import jax.numpy as jnp

    from xgnn_tpu import RunConfig
    from xgnn_tpu.engine import Engine

    ds = learn_ds
    steps_wanted = 20
    config = RunConfig(
        batch_size=len(ds.train_set) // (steps_wanted + 1),
        fanout=(4, 3),
        num_layer=2,
        num_hidden=16,
        model=model_name,
        dropout=0.0,  # determinism across frameworks
        lr=0.01,
        pipeline=False,
        gpu_extract=False,  # local-id blocks: the torch twin reads the same x
        cache_percentage=0.0,
        num_epoch=1,
        root_path="/tmp",
        dataset="synthetic",
    )
    engine = Engine(ds, config).init()

    # ---- replay exactly what train_epoch does, EXPORTING each step ----
    from xgnn_tpu.engine.shuffler import Shuffler

    shuffler = Shuffler(ds.train_set, config.batch_size,
                        seed=config.seed + 1, num_worker=1)
    sample_base = jax.random.fold_in(engine._sample_key, 0)
    drop_base = jax.random.fold_in(engine._dropout_key, 0)
    # export the init BEFORE stepping: the jitted train step DONATES the
    # state buffers (engine.state is consumed by step 0)
    params_np = jax.tree.map(lambda a: np.asarray(a), engine.state.params)
    exported = []
    state = engine.state
    jax_losses = []
    for step, (seeds, n) in enumerate(shuffler.epoch_batches(0)):
        item = ((seeds, n), jax.random.fold_in(sample_base, step), (0, step))
        batch, x, labels, info, _ = engine._produce(item)
        exported.append((
            [np.asarray(b.neigh) for b in batch.blocks],
            np.asarray(x, np.float32),
            np.asarray(labels),
            int(batch.num_output),
        ))
        state, metrics = engine._train_step(
            state, batch.blocks, x, labels, batch.num_output,
            jax.random.fold_in(drop_base, step), batch.overflow,
        )
        jax_losses.append(metrics["loss"])
    jax_losses = np.asarray(jnp.stack(jax_losses))
    assert len(exported) >= steps_wanted
    assert np.isfinite(jax_losses).all()  # no overflow-skipped steps

    # ---- independent torch twin on the exported steps ----
    net = _torch_sage_net if model_name == "graphsage" else _torch_gcn_net
    forward, flat_params = net(params_np, config.num_layer)
    opt = torch.optim.Adam(flat_params, lr=config.lr, eps=1e-8)
    torch_losses = []
    for blocks_np, x_np, labels_np, num_out in exported:
        opt.zero_grad()
        logits = forward(blocks_np, torch.from_numpy(x_np))
        loss = _torch_masked_ce(
            logits, torch.from_numpy(labels_np.astype(np.int64)), num_out
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))
    torch_losses = np.asarray(torch_losses)

    # the learning signal must be real (planted-signal dataset): the
    # trajectory should actually descend, or this test proves nothing
    assert jax_losses[-1] < jax_losses[0] * 0.9
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-3)

    # ---- and train_epoch() on a fresh identical engine reproduces the
    # replayed loop exactly (binds the epoch-loop integration: shuffler
    # seeding, key folding, masking, skip handling) ----
    engine2 = Engine(ds, config).init()
    r = engine2.train_epoch(0)
    np.testing.assert_allclose(
        r["loss"], float(np.nanmean(jax_losses)), rtol=1e-5
    )
