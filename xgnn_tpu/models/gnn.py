"""GNN model zoo over dense-fanout sampled blocks.

Re-implements the model families the reference trains through DGL
(``example/samgraph/sgnn/train_{gcn,graphsage,pinsage}.py``,
``example/samgraph/train_gat.py``) as Flax modules operating on this
framework's static-shape :class:`~xgnn_tpu.types.Block` layout.

The aggregation geometry is the TPU-native departure: instead of SpMM over
ragged COO (the reference's cusparse path, ``sam_backend/scattergather.cu``),
each layer gathers neighbor rows into a dense ``(dst, fanout, feat)`` tensor
and reduces over the fanout axis with a validity mask — a gather + masked
reduce + matmul chain that XLA fuses and tiles onto the MXU with no
irregularity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import constants as C
from ..types import Block


def _spread_invalid(neigh: jax.Array, valid: jax.Array, num_rows: int):
    """Replace invalid pick indices with DISTINCT row ids.

    Parking every EMPTY pick on row 0 makes the transactions that hit row 0
    serialize — in the forward gather AND in its VJP's scatter-add
    (collision_bench.tsv: 46.6 → 35.3 GB/s at 30-45% padding; PERF.md calls
    the layer-1 backward scatter "collision-degraded" at 54 GB/s).  Spread
    slots are value-safe both ways: forward rows are masked by the weight
    term, and the VJP scatters exact zeros for masked lanes.
    """
    spread = (
        jax.lax.broadcasted_iota(jnp.int32, neigh.shape, 0)
        * (neigh.shape[1] if neigh.ndim > 1 else 1)
        + (
            jax.lax.broadcasted_iota(jnp.int32, neigh.shape, 1)
            if neigh.ndim > 1
            else 0
        )
    ) % max(num_rows, 1)
    return jnp.where(valid, neigh, spread)


def gather_neigh(h_src: jax.Array, block: Block):
    """Gather neighbor features: ``(dst_cap, fanout, feat)`` + mask.

    Only for small blocks — materializes the full (dst, K, F) tensor.  The
    model layers use :func:`fanout_reduce` instead, which streams over the
    fanout axis."""
    mask = block.mask
    idx = _spread_invalid(block.neigh, mask, h_src.shape[0])
    nb = jnp.take(h_src, idx, axis=0, mode="clip")
    return nb, mask


def fanout_reduce(h_src: jax.Array, block: Block, weights=None,
                  impl: str = "loop"):
    """Masked (weighted) sum + count over neighbors WITHOUT materializing the
    full ``(dst, fanout, feat)`` tensor.

    ``impl="loop"``: a static unrolled loop of K row-gathers, each fused by
    XLA into a gather+FMA — but each pass round-trips the ``(dst, F)``
    accumulator through HBM.  ``impl="tiled"``: scan over dst tiles with an
    on-chip ``(tile, K, F)`` reduction and a single output write per tile
    (:func:`xgnn_tpu.ops.fanout.fanout_reduce_tiled`) — see PERF.md.

    Returns ``(sum, denom)`` with ``denom = Σ mask`` (or ``Σ weights``).
    """
    if impl == "tiled":
        from ..ops.fanout import fanout_reduce_tiled

        return fanout_reduce_tiled(h_src, block.neigh, weights)
    if impl.startswith("chunk"):
        return _fanout_reduce_chunked(
            h_src, block, weights, int(impl[5:] or 3)
        )
    dst_cap, fanout = block.neigh.shape
    # bf16-STORED sources (feat_dtype="bfloat16"): gathers read half the
    # bytes; the accumulator stays float32
    acc_dt = jnp.float32 if h_src.dtype == jnp.bfloat16 else h_src.dtype
    acc = jnp.zeros((dst_cap, h_src.shape[1]), acc_dt)
    denom = jnp.zeros((dst_cap, 1), acc_dt)
    # EMPTY picks spread over distinct rows (see _spread_invalid): the
    # per-pass offset k decorrelates passes so no two passes park their
    # invalid lanes on the same rows either
    base = jax.lax.broadcasted_iota(jnp.int32, (dst_cap, 1), 0)[:, 0]
    n_rows = max(h_src.shape[0], 1)
    for k in range(fanout):
        col = block.neigh[:, k]
        valid = col != C.EMPTY_KEY
        m = valid.astype(acc_dt)[:, None]
        if weights is not None:
            m = m * weights[:, k].astype(acc_dt)[:, None]
        rows = jnp.take(
            h_src, jnp.where(valid, col, (base * fanout + k) % n_rows),
            axis=0, mode="clip",
        )
        acc = acc + rows * m
        denom = denom + m
    return acc, denom


def _fanout_reduce_chunked(h_src, block: Block, weights, chunk: int):
    """Statically-unrolled chunked fanout reduce: one (dst, chunk, F)
    gather+mask+sum per pass instead of ``chunk`` separate gather+FMA
    passes — the accumulator round-trips HBM fanout/chunk times instead of
    fanout times.  Whether this wins depends on whether XLA fuses the
    chunk gather into the reduction (accumulator traffic /chunk) or
    materializes the (dst, chunk, F) slab (traffic slightly worse than the
    loop) — an A/B question, not a derivable one (``XGNN_BENCH_AGG=chunk``;
    the scan-based tiled impl loses to per-iteration overhead instead).
    """
    dst_cap, fanout = block.neigh.shape
    acc_dt = jnp.float32 if h_src.dtype == jnp.bfloat16 else h_src.dtype
    acc = jnp.zeros((dst_cap, h_src.shape[1]), acc_dt)
    denom = jnp.zeros((dst_cap, 1), acc_dt)
    n_rows = max(h_src.shape[0], 1)
    base = jax.lax.broadcasted_iota(jnp.int32, (dst_cap, 1), 0)
    for k0 in range(0, fanout, chunk):
        cols = block.neigh[:, k0 : k0 + chunk]
        valid = cols != C.EMPTY_KEY
        m = valid.astype(acc_dt)
        if weights is not None:
            m = m * weights[:, k0 : k0 + chunk].astype(acc_dt)
        spread = (
            base * fanout
            + k0
            + jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
        ) % n_rows
        rows = jnp.take(
            h_src, jnp.where(valid, cols, spread), axis=0, mode="clip"
        )  # (dst, c, F)
        acc = acc + jnp.sum(rows.astype(acc_dt) * m[..., None], axis=1)
        denom = denom + jnp.sum(m, axis=1, keepdims=True)
    return acc, denom


def masked_mean_stream(h_src: jax.Array, block: Block, weights=None,
                       impl: str = "loop"):
    s, denom = fanout_reduce(h_src, block, weights, impl)
    return s / jnp.maximum(denom, 1e-9)


def _take_dst(block: Block, h_src: jax.Array) -> jax.Array:
    """The dst rows of a block: prefix of ``h_src`` (local-id blocks), or a
    gather by global id (direct-extract blocks, ``Block.dst_ids``)."""
    if block.dst_ids is None:
        return h_src[: block.dst_cap]
    # EMPTY (int32 max) is out of range for any real table: a fill-mode
    # gather zero-fills those rows directly — no separate (dst_cap, F)
    # validity-mask multiply pass
    return jnp.take(h_src, block.dst_ids, axis=0, mode="fill", fill_value=0)


class SAGEConv(nn.Module):
    """GraphSAGE mean aggregator (DGL ``SAGEConv('mean')`` semantics:
    ``W_self h_dst + W_neigh mean(h_N)``)."""

    out_dim: int
    param_dtype: Any = jnp.float32
    agg_impl: str = "loop"

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        h_dst = _take_dst(block, h_src)
        h_neigh = masked_mean_stream(h_src, block, impl=self.agg_impl)
        return nn.Dense(self.out_dim, use_bias=False, param_dtype=self.param_dtype)(
            h_dst
        ) + nn.Dense(self.out_dim, use_bias=True, param_dtype=self.param_dtype)(h_neigh)


class PinSAGEConv(nn.Module):
    """SAGE-style aggregation with visit-count edge weights from the random
    walk sampler (reference emits weights in ``TrainGraph::data``)."""

    out_dim: int
    param_dtype: Any = jnp.float32
    agg_impl: str = "loop"

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        h_dst = _take_dst(block, h_src)
        h_neigh = masked_mean_stream(
            h_src, block, weights=block.weights, impl=self.agg_impl
        )
        return nn.Dense(self.out_dim, use_bias=False, param_dtype=self.param_dtype)(
            h_dst
        ) + nn.Dense(self.out_dim, use_bias=True, param_dtype=self.param_dtype)(h_neigh)


class GCNConv(nn.Module):
    """Graph convolution with symmetric normalization (DGL ``GraphConv``
    ``norm='both'``, ``allow_zero_in_degree=True``): degrees are computed on
    the sampled block.

    Like DGL's GraphConv, the linear transform and the aggregation are
    reordered by shape — per-row scaling and the masked neighbor sum commute
    with a right-matmul, so ``agg(norm · h) W == agg(norm · (h W))`` exactly.
    Aggregate-first (``in_dim <= out_dim``, e.g. every non-final layer at
    feat→hidden/hidden→hidden widths) is the TPU fast path: the matmul runs
    over the SMALL dst frontier instead of the full src frontier, the
    neighbor gather moves ``in_dim``-wide rows instead of ``out_dim``-wide
    ones, and no ``(src_cap, out_dim)`` activation is ever materialized —
    which is what forced layer remat at full-graph-scale frontiers."""

    out_dim: int
    activation: Optional[Callable] = None
    param_dtype: Any = jnp.float32
    agg_impl: str = "loop"

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        maskf = block.mask.astype(jnp.float32)  # degree counts must not round
        in_deg = jnp.sum(maskf, axis=1)
        # Block-local src out-degree, computed PER PICK (sort-based
        # multiplicity, cost ~ edges) rather than as a (src_cap,) scatter
        # table + full-table scale pass (cost ~ nodes): identical math —
        # sum_k h[col_k]/sqrt(out_deg[col_k]) with the weight riding
        # fanout_reduce's per-pick weights input — but no scatter and no
        # node-table-proportional work (PERF.md "GCN degree pass").
        from ..ops.degree import pick_multiplicity

        cnt = pick_multiplicity(block.neigh).astype(jnp.float32)
        w = jax.lax.rsqrt(jnp.maximum(cnt, 1.0))

        dense = nn.Dense(
            self.out_dim, use_bias=False, param_dtype=self.param_dtype
        )
        if h_src.shape[1] > self.out_dim:
            # transform first: narrows the aggregation width (last layer)
            agg, _ = fanout_reduce(dense(h_src), block, weights=w,
                                   impl=self.agg_impl)
        else:
            # aggregate first: matmul over dst rows only, gather in_dim-wide
            # rows (bf16-stored features keep their half-width gathers)
            agg, _ = fanout_reduce(h_src, block, weights=w,
                                   impl=self.agg_impl)
            agg = dense(agg)
        agg = agg * (1.0 / jnp.sqrt(jnp.maximum(in_deg, 1.0)))[:, None]
        agg = agg + self.param(
            "bias", nn.initializers.zeros, (self.out_dim,), self.param_dtype
        )
        if self.activation is not None:
            agg = self.activation(agg)
        return agg


def _mp_dot(x: jax.Array, w: jax.Array) -> jax.Array:
    """Matmul keeping bf16 operands on the MXU bf16 path with f32
    accumulation (``preferred_element_type``) instead of letting dtype
    promotion silently upcast to a f32 matmul — on TPU the bf16 systolic
    path is several× the f32 rate, and the f32 accumulator preserves the
    reduction precision."""
    if x.dtype == jnp.bfloat16:
        return jnp.matmul(
            x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
    return x @ w


def _mp_einsum(subscripts: str, x: jax.Array, w: jax.Array) -> jax.Array:
    """:func:`_mp_dot` for einsum contractions (bf16 operands, f32 acc)."""
    if x.dtype == jnp.bfloat16:
        return jnp.einsum(
            subscripts, x, w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(subscripts, x, w)


def gat_select_path(
    dst_cap: int,
    fanout: int,
    in_dim: int,
    num_heads: int,
    out_dim: int,
    acc_limit: Optional[int],
    mat_limit: int,
) -> str:
    """Choose the GAT aggregation path from shapes (VERDICT r3 item 6b: a
    bytes model instead of the hand-tuned 200M element threshold).

    Estimated HBM traffic in units of K·dst·in elements:

    * ``aggregate_first``: ``1 + 2H`` — one input-width row gather per pick
      plus a (dst, H, in) accumulator read+write per pick.
    * ``contraction``: flat ``4`` — materialize the (dst, K, in) picks once
      (gather read + write), MXU reads it twice (scores, weighted reduce).
      Wins exactly when H >= 2; capped by ``mat_limit`` elements.
    * ``per_pick``: ``(2·in + 3·H·D)/in`` — gather + K transform matmuls
      with a (dst, H·D) accumulator; the fallback when contraction is
      wanted but the picks buffer doesn't fit.

    Measured anchors (PERF.md "GAT path-selection A/B", fanout_bench.tsv):
    8-head middle layer +11.6% in contraction form, 1-head layers best
    aggregate-first, 8-head layer 0 (mat-capped) per-pick.  An explicit
    ``acc_limit`` int restores the old element-count threshold semantics.
    """
    mat_fits = dst_cap * fanout * in_dim <= mat_limit
    if acc_limit is None:
        want_con = num_heads >= 2
        if want_con and mat_fits:
            return "contraction"
        if (
            want_con
            and not mat_fits
            and 2 * in_dim + 3 * num_heads * out_dim
            < (1 + 2 * num_heads) * in_dim
        ):
            return "per_pick"
        return "aggregate_first"
    over = dst_cap * num_heads * in_dim > acc_limit
    if over and mat_fits:
        return "contraction"
    if over:
        return "per_pick"
    return "aggregate_first"


class GATConv(nn.Module):
    """Graph attention (DGL ``GATConv`` semantics, sampled-block edition).

    The "sequence" dimension of GAT is the fanout axis: SDDMM + edge-softmax
    + SpMM (reference SURVEY §5.7) collapses to a masked softmax over the
    dense ``(dst, fanout)`` score matrix — no ragged segment ops.  The loop
    paths fuse all three into ONE pass over the picks with an online
    (flash-attention-style) softmax: each pick's gathered rows produce both
    the score and the payload, so there is no ``(src, H)`` score table and
    no per-pick element gather of it (element gathers cost one HBM
    transaction per H·4-byte row — the former hidden GAT cost).

    Like GCNConv, linearity is exploited to keep the transform off the src
    frontier: the attention projections fold into the kernel
    (``el = h·(W·attn_l)`` — two skinny matmuls instead of materializing the
    ``(src, H·D)`` transformed features), and when ``in_dim <= H·D`` the
    per-head weighted sum commutes with the transform
    (``Σₖ aₖ (hₖW) == (Σₖ aₖ hₖ) W``) so the matmul runs over dst rows and
    the gathers move input-width rows.  Result: no ``(src_cap, hidden)``
    activation at any layer, the change that forced remat at
    full-graph-scale frontiers."""

    out_dim: int
    num_heads: int = 1
    negative_slope: float = 0.2
    param_dtype: Any = jnp.float32
    # Path selection is a BYTES MODEL by default (acc_limit=None): per
    # K·dst·in elements moved, aggregate-first costs (1 + 2H) HBM passes
    # (one row gather + a (dst, H, in) accumulator read+write per pick) vs
    # the contraction form's flat 4 (materialize (dst, K, in) once, MXU
    # reads it three times) — so contraction wins exactly when H >= 2,
    # capped by mat_limit (the materialized-picks buffer, default 4.8 GB
    # f32).  When contraction is wanted but doesn't fit, per-pick transform
    # (accumulator (dst, H·D), K·dst·(2·in + 3·H·D) bytes) takes over if it
    # beats aggregate-first's (1+2H)·K·dst·in.  Measured anchors: the bench
    # 8-head middle layer (dst 133k, K 10, in 256) runs 11.6% faster in
    # contraction form (PERF.md "GAT path-selection A/B"), the 1-head paths
    # resolved in favor of aggregate-first (fanout_bench.tsv), and the
    # 8-head layer 0 (mat-capped) in per-pick form.  An explicit acc_limit
    # int restores the element-count threshold (tests / A/Bs force paths
    # with it).
    acc_limit: Optional[int] = None
    mat_limit: int = 1_200_000_000

    # (selection logic lives in gat_select_path below — unit-testable)

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        h, d = self.num_heads, self.out_dim
        in_dim = h_src.shape[1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, h, d),
            self.param_dtype,
        )
        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(), (h, d), self.param_dtype)
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(), (h, d), self.param_dtype)
        # folded score projections: el = Σ_d (hW)·attn_l = h (W attn_l)
        wl = jnp.einsum("ihd,hd->ih", kernel, attn_l)  # (in, H)
        wr = jnp.einsum("ihd,hd->ih", kernel, attn_r)

        mask = block.mask
        idx = _spread_invalid(block.neigh, mask, h_src.shape[0])
        # dst-side score term from DST rows only — with direct extract the
        # src table is the whole feature store, so a full-frontier el/er
        # matmul pair would read it twice per layer (bf16-stored features
        # promote inside the matmul — no full-width astype pass)
        el_dst = _mp_dot(_take_dst(block, h_src), wl)  # (dst, H)
        acc_dt = jnp.float32 if h_src.dtype == jnp.bfloat16 else el_dst.dtype

        # ---- path selection (same thresholds as the aggregation paths) ----
        if in_dim > h * d:
            # transform first (narrows the gather width — last layer): the
            # loop gathers TRANSFORMED rows, so the src-side score comes from
            # those same rows ((hW)·attn_r == h·(W attn_r) exactly)
            feat = _mp_dot(h_src, kernel.reshape(in_dim, h * d))

            def score(rows):
                return jnp.einsum(
                    "bhd,hd->bh", rows.reshape(-1, h, d), attn_r.astype(rows.dtype)
                )

            def payload(rows, w):
                return rows.reshape(-1, h, d).astype(acc_dt) * w[:, :, None]

            acc, s = self._online_attend(
                feat, idx, mask, el_dst, (block.dst_cap, h, d), acc_dt,
                score, payload,
            )
            out = acc / jnp.maximum(s, 1e-9)[:, :, None]
            return out.reshape(block.dst_cap, h * d).astype(wl.dtype)

        path = gat_select_path(
            block.dst_cap, block.fanout, in_dim, h, d,
            self.acc_limit, self.mat_limit,
        )
        if path == "contraction":
            # contraction form: materialize the gathered picks ONCE as
            # (dst, K, in); scores AND the K-fold reduction both read that
            # buffer — no second gather, and the reduction happens in f32
            # MXU accumulators instead of K round-trips of a (dst, H, ·)
            # HBM accumulator.  Many-head hot path (reference 8-head GAT,
            # train_gat.py:73).
            rows_all = jnp.take(h_src, idx, axis=0, mode="clip")
            er_k = _mp_einsum("bki,ih->bkh", rows_all, wr)
            e = nn.leaky_relu(
                el_dst[:, None, :] + er_k, negative_slope=self.negative_slope
            )
            e = jnp.where(mask[..., None], e, -jnp.inf)
            e_max = jnp.max(e, axis=1, keepdims=True)
            e_max = jax.lax.stop_gradient(
                jnp.where(jnp.isfinite(e_max), e_max, 0.0)
            )
            a = jnp.exp(e - e_max) * mask[..., None]
            a = a / jnp.maximum(jnp.sum(a, axis=1, keepdims=True), 1e-9)
            agg = jnp.einsum(
                "bkh,bki->bhi", a.astype(rows_all.dtype), rows_all,
                preferred_element_type=jnp.float32,
            )
            out = jnp.einsum(
                "bhi,ihd->bhd", agg.astype(acc_dt), kernel.astype(acc_dt)
            )
            return out.reshape(block.dst_cap, h * d).astype(wl.dtype)

        if path == "per_pick":
            # per-pick transform: each pick is pushed through the kernel
            # immediately so the accumulator is (dst, H, D) instead of
            # (dst, H, in) — K matmuls instead of one, bought for an
            # H·in/(H·D)-fold smaller live accumulator
            k2 = kernel.reshape(in_dim, h * d)

            def score(rows):
                return _mp_dot(rows, wr.astype(rows.dtype))

            def payload(rows, w):
                y = _mp_dot(rows, k2).astype(acc_dt).reshape(-1, h, d)
                return y * w[:, :, None]

            acc, s = self._online_attend(
                h_src, idx, mask, el_dst, (block.dst_cap, h, d), acc_dt,
                score, payload,
            )
            out = acc / jnp.maximum(s, 1e-9)[:, :, None]
            return out.reshape(block.dst_cap, h * d).astype(wl.dtype)

        # aggregate first: gather input-width rows ONCE per pick (shared by
        # all heads), per-head matmul over dst rows only
        def score(rows):
            return _mp_dot(rows, wr.astype(rows.dtype))

        def payload(rows, w):
            return rows[:, None, :].astype(acc_dt) * w[:, :, None]

        acc, s = self._online_attend(
            h_src, idx, mask, el_dst, (block.dst_cap, h, in_dim), acc_dt,
            score, payload,
        )
        agg = acc / jnp.maximum(s, 1e-9)[:, :, None]
        out = jnp.einsum("bhi,ihd->bhd", agg, kernel.astype(acc_dt))
        return out.reshape(block.dst_cap, h * d).astype(wl.dtype)

    def _online_attend(self, src_table, idx, mask, el_dst, acc_shape, acc_dt,
                       score_fn, payload_fn):
        """Single-pass masked edge-softmax aggregation (online softmax).

        The two-pass form needs the src-side score ``er[idx]`` before the
        aggregation loop — either a separate (src, H) projection gathered
        per pick (element-transaction-bound: H·4-byte rows cost one HBM
        transaction each, ~80M/s) or a second full gather of the feature
        rows.  Instead this fuses SDDMM + edge-softmax + weighted SpMM into
        ONE pass over the picks with flash-attention-style running
        (max, sum, acc) rescaling: each pick's rows are gathered once and
        used for both its score and its payload.  Exact softmax (not an
        approximation); the running max is shift-invariant so it carries no
        gradient (``stop_gradient``)."""
        dst_cap, fanout = idx.shape
        num_heads = el_dst.shape[1]
        m = jnp.full((dst_cap, num_heads), -jnp.inf, acc_dt)
        s = jnp.zeros((dst_cap, num_heads), acc_dt)
        acc = jnp.zeros(acc_shape, acc_dt)
        bshape = (dst_cap, num_heads) + (1,) * (len(acc_shape) - 2)
        for k in range(fanout):
            rows = jnp.take(src_table, idx[:, k], axis=0, mode="clip")
            e = nn.leaky_relu(
                el_dst + score_fn(rows).astype(el_dst.dtype),
                negative_slope=self.negative_slope,
            ).astype(acc_dt)
            e = jnp.where(mask[:, k, None], e, -jnp.inf)
            # the running max is a shift constant: it must be severed from
            # the graph EVERYWHERE (a half-severed pair breaks the telescoping
            # cancellation and corrupts the kernel gradient)
            m_new = jnp.maximum(m, jax.lax.stop_gradient(e))
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            scale = jnp.exp(m - m_safe)
            w = jnp.exp(e - m_safe)
            s = s * scale + w
            acc = acc * scale.reshape(bshape) + payload_fn(rows, w)
            m = m_new
        return acc, s


class MLPConv(nn.Module):
    """Feature-only control: ignores the sampled neighborhood entirely
    (``W h_dst + b``).  Not a reference model — the baseline the hop2
    synthetic task (synthetic.plant_hop2_task) is calibrated against: a GNN
    whose aggregation path works must beat this by a wide margin, while an
    aggregation bug collapses the GNN onto it."""

    out_dim: int
    param_dtype: Any = jnp.float32
    agg_impl: str = "loop"  # zoo-interface parity; unused

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        return nn.Dense(
            self.out_dim, use_bias=True, param_dtype=self.param_dtype
        )(_take_dst(block, h_src))


_CONVS = {
    "graphsage": SAGEConv,
    "gcn": GCNConv,
    "gat": GATConv,
    "pinsage": PinSAGEConv,
    "mlp": MLPConv,
}


class GNN(nn.Module):
    """Multi-layer GNN over a list of sampled blocks (outermost first).

    Mirrors the reference model builders: dropout between layers, ReLU on
    hidden layers, raw logits out
    (``example/samgraph/sgnn/train_gcn.py:18-46``).
    """

    conv: str
    hidden_dim: int
    out_dim: int
    num_layers: int
    dropout: float = 0.5
    num_heads: int = 1
    compute_dtype: Any = jnp.float32
    agg_impl: str = "loop"
    # rematerialize each conv layer in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for NOT storing the per-layer intermediates.
    # Since the aggregate-first reorder no conv materializes a
    # (src_cap, hidden) activation, so this is an escape hatch for
    # unusually wide hidden dims / many-head GAT at huge frontiers
    remat: bool = False
    # GAT path-selection (see GATConv): None = shape-driven bytes model;
    # an int restores the element-count threshold for A/Bs
    gat_acc_limit: Optional[int] = None
    gat_mat_limit: int = 1_200_000_000

    @nn.compact
    def __call__(self, blocks: Sequence[Block], x: jax.Array, train: bool = False):
        conv_cls = _CONVS[self.conv]
        # explicit layer names: nn.remat renames the class (Checkpoint…),
        # which would change the param paths — and therefore the init RNG
        # stream and checkpoint layout.  remat must be a pure runtime knob.
        base_name = conv_cls.__name__
        if self.remat:
            conv_cls = nn.remat(conv_cls)
        # bf16-STORED features stay bf16 so the first layer's gathers read
        # half the bytes; an up-front astype would cost a full-table pass
        h = x if x.dtype == jnp.bfloat16 else x.astype(self.compute_dtype)
        for i in range(self.num_layers):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            dim = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            kwargs = {}
            if _CONVS[self.conv] is not GATConv:
                kwargs["agg_impl"] = self.agg_impl
            else:
                # heads on hidden layers, single head for logits (DGL style)
                kwargs["num_heads"] = 1 if i == self.num_layers - 1 else self.num_heads
                if i != self.num_layers - 1:
                    dim = self.hidden_dim // max(self.num_heads, 1)
                kwargs["acc_limit"] = self.gat_acc_limit
                kwargs["mat_limit"] = self.gat_mat_limit
            layer = conv_cls(out_dim=dim, name=f"{base_name}_{i}", **kwargs)
            h = layer(blocks[i], h)
            if i != self.num_layers - 1:
                # reference GAT uses ELU between layers (train_gat.py:59,
                # ``F.elu``); the rest of the zoo uses ReLU
                h = nn.elu(h) if self.conv == "gat" else nn.relu(h)
        return h.astype(jnp.float32)


def build_model(config, feat_dim: int, num_class: int) -> GNN:
    import os

    del feat_dim
    name = config.model
    num_layers = (
        config.num_layer_pinsage if name == "pinsage" else config.num_layer
    )
    acc_env = os.environ.get("XGNN_GAT_ACC_LIMIT")
    return GNN(
        # default None → the GATConv bytes model decides; env int forces
        # the old element-count threshold (A/B escape hatch)
        gat_acc_limit=int(acc_env) if acc_env else None,
        gat_mat_limit=int(os.environ.get("XGNN_GAT_MAT_LIMIT", 1_200_000_000)),
        conv=name,
        hidden_dim=config.num_hidden,
        out_dim=num_class,
        num_layers=num_layers,
        dropout=config.dropout,
        num_heads=config.num_head,
        compute_dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32,
        agg_impl=getattr(config, "agg_impl", "loop"),
        remat=getattr(config, "remat", False),
    )
