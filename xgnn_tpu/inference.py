"""Full-neighbor layer-wise inference (offline evaluation).

Analog of the reference's independent accuracy harness
(``example/samgraph/train_accuracy.py``): instead of re-sampling fanouts for
evaluation, each layer is computed exactly over ALL neighbors for ALL nodes
(the standard DGL offline-inference scheme) using the full-graph SpMM —
giving a sampling-noise-free accuracy number to compare against training-time
estimates.

Supports the SAGE / GCN convolutions (attention models evaluate through the
sampled path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.gnn import GNN
from .ops.spmm import gat_aggregate_csr, spmm_csr


def _infer_layer_sage(params, indptr, indices, h, num_node, chunk, agg):
    h_neigh = agg(h, mean=True)
    w_self = params["Dense_0"]["kernel"]
    w_neigh = params["Dense_1"]["kernel"]
    b = params["Dense_1"]["bias"]
    return h @ w_self + h_neigh @ w_neigh + b


def _infer_layer_gcn(params, indptr, indices, h, num_node, chunk, agg):
    deg = (indptr[1:num_node + 1] - indptr[:num_node]).astype(h.dtype)
    inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(deg, 1.0))
    hw = h @ params["Dense_0"]["kernel"]
    hw = hw * inv_sqrt[:, None]
    out = agg(hw, mean=False)
    return out * inv_sqrt[:, None] + params["bias"]


def _infer_layer_gat(params, indptr, indices, h, num_node, chunk, heads,
                     gat_agg=None):
    """Exact full-neighbor GAT layer (DGL GATConv semantics)."""
    w = params["kernel"].reshape(params["kernel"].shape[0], -1)  # (F, H*D)
    d = w.shape[1] // heads
    feat = (h @ w).reshape(num_node, heads, d)
    el = jnp.sum(feat * params["attn_l"], axis=-1)
    er = jnp.sum(feat * params["attn_r"], axis=-1)
    if gat_agg is not None:  # degree-bucketed two-pass segment softmax
        out = gat_agg(feat, el, er)
    else:
        out = gat_aggregate_csr(
            indptr, indices, feat, el, er, num_node=num_node, chunk=chunk
        )
    return out.reshape(num_node, heads * d)


def full_graph_inference(
    model: GNN,
    params,
    indptr: jax.Array,
    indices: jax.Array,
    feat: jax.Array,
    chunk: int = 1 << 20,
    num_node=None,
) -> jax.Array:
    """Return logits for every node via exact layer-wise propagation.

    Degree normalization is over the FULL neighbor set, which is the
    evaluation-time semantics the reference's DGL accuracy harness uses.
    """
    # NOTE: pass num_node explicitly for tile-padded Graph arrays; dataset
    # arrays (the usual callers) are exact-length
    if num_node is None:
        num_node = indptr.shape[0] - 1
    # degree-bucketed SpMM plan (gather+reduce, no per-edge scatter — the
    # edge-scatter spmm_csr measured ~3 GB/s at 100M-edge scale,
    # spmm_bench.tsv); built once per graph, shared by all layers
    import numpy as np

    from .ops.spmm import build_spmm_plan, spmm_csr_planned

    indptr_host = np.asarray(indptr)[: num_node + 1]
    # fine_buckets: 3*2^k midpoint caps lift slab fill 0.70 -> 0.84 and the
    # transaction-bound gather 16.4 -> 20.6 GB/s at products scale (PERF.md
    # round-3 fine-bucket A/B); ~2x bucket compiles, amortized by the
    # persistent compile cache
    plan, plan_meta = build_spmm_plan(indptr_host, fine_buckets=True)
    # pre-expand the padded neighbor-id matrices on device: removes the
    # in-kernel take_runs id fetch — 1.68 s of the 3.18 s products-scale
    # SpMM, putting the pass at the measured transaction floor
    # (spmm_attrib.tsv round 5: 20.9 -> 44.5 GB/s) for ~+20% of the
    # indices array in HBM, amortized over every layer/epoch.  Skipped for
    # GAT: its full-graph pass already holds three (n, H, D) tensors and
    # the extra id matrices push products-scale 8-head inference over HBM
    # (measured OOM, tpu_r5d_sddmm2.log) — the non-pre planned SDDMM runs
    # there instead.  XGNN_SPMM_PRE_IDS=0/1 overrides.
    import os

    from .ops.spmm import materialize_plan_ids

    pre_env = os.environ.get("XGNN_SPMM_PRE_IDS")
    want_pre = (
        pre_env == "1" if pre_env is not None else model.conv != "gat"
    )
    if want_pre:
        materialize_plan_ids(plan, plan_meta, indices, num_node)
    deg_h = np.diff(indptr_host)
    inv_deg = jnp.asarray(
        np.where(deg_h > 0, 1.0 / np.maximum(deg_h, 1), 0.0).astype(
            np.float32
        )
    )

    def agg(x, mean):
        return spmm_csr_planned(
            plan, plan_meta, indices, x, mean=mean, inv_deg=inv_deg
        )

    from .ops.spmm import gat_aggregate_planned

    def gat_agg(feat, el, er):
        return gat_aggregate_planned(plan, plan_meta, indices, feat, el, er)

    layer_fns = {
        "graphsage": _infer_layer_sage,
        "pinsage": _infer_layer_sage,  # uniform weights at eval
        "gcn": _infer_layer_gcn,
        "gat": _infer_layer_gat,
    }
    fn = layer_fns[model.conv]
    h = feat
    for i in range(model.num_layers):
        layer_params = params[_layer_key(model, i)]
        if model.conv == "gat":
            heads = 1 if i == model.num_layers - 1 else model.num_heads
            h = fn(layer_params, indptr, indices, h, num_node, chunk,
                   heads, gat_agg=gat_agg)
        else:
            h = fn(layer_params, indptr, indices, h, num_node, chunk, agg)
        if i != model.num_layers - 1:
            # same inter-layer activation as training (models/gnn.py):
            # reference GAT uses F.elu (train_gat.py:59), the rest ReLU
            h = jax.nn.elu(h) if model.conv == "gat" else jax.nn.relu(h)
    return h


def _layer_key(model: GNN, i: int) -> str:
    name = {
        "graphsage": "SAGEConv",
        "pinsage": "PinSAGEConv",
        "gcn": "GCNConv",
        "gat": "GATConv",
    }[model.conv]
    return f"{name}_{i}"


def evaluate_full(model, params, indptr, indices, feat, label, node_set) -> float:
    logits = full_graph_inference(model, params, indptr, indices, feat)
    pred = jnp.argmax(logits, axis=-1)
    sel = jnp.asarray(np.asarray(node_set))
    ok = jnp.sum(pred[sel] == jnp.asarray(label)[sel])
    return float(ok) / len(node_set)
