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
