"""Collocated multi-chip training steps (the XGNN arch6 analog).

Every chip samples, extracts, and trains its own mini-batch shard (reference
``RunArch6LoopsOnce``, ``dist/dist_loops_arch6.cc:55-199``), expressed as
SPMD programs over a named mesh.  Two execution shapes:

**Fused** (everything HBM-resident): ONE jitted program per step —
sample (replicated or partitioned topology) → feature fetch from the
100%-interleaved HBM store via sorted all-to-all → forward/backward →
gradient psum → replicated update.

**Two-phase** (the full GGMS: partial partitioned cache + host tiers):
program A samples and splits feature requests into cache hits (gathered
through the owner-chip exchange) and misses (compacted id buffer returned to
the host); the host gathers miss rows from host RAM (``clib.gather_rows``,
the ``GPUExtractMissData`` analog) while the device runs the NEXT step's
program A; program B scatters the miss rows in and trains.  The A/B seam is
exactly the reference's task-queue boundary between the sample and
cache-copy sub-loops (``dist_loops_arch6.cc:86-142``) and is what the
``--pipeline`` overlap rides.

The batch pytree crosses the A→B seam as device-resident sharded arrays
(scalars widened to per-chip ``(1,)`` lanes) — nothing but the miss ids
touches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as PS
from jax import shard_map

from .. import constants as C
from ..config import RunConfig
from ..sampler import _sample_minibatch, _layer_fanouts
from ..train import TrainState, loss_fn, make_optimizer
from ..types import Block, SampledBatch
from .exchange import (
    partitioned_gather,
    partitioned_gather_indirect,
    plan_exchange,
)
from .ggms import cache_split, combine_miss
from .mesh import DATA_AXIS

EMPTY = C.EMPTY_KEY


def _block0_via_picks(block: Block, pick: jax.Array, input_nodes: jax.Array):
    """Rewrite the INPUT layer's block to direct-extract form against the raw
    exchange response buffer.

    ``neigh``/dst indices compose through ``pick`` (request order →
    linearized (owner, rank) slot), so the model's layer-0 gathers read the
    ``(P*seg, F)`` response directly — the request-order ``(cap, F)``
    materialization (a full write of every feature row + its re-read by the
    model, the "structural double read" in PERF.md's dist-graph step trace)
    never exists.  Exact: valid picks are injective (the dedup'd frontier is
    unique per request slot), EMPTY sentinels pass through, and dst rows
    beyond the valid prefix get EMPTY ``dst_ids`` (``_take_dst`` zero-fills
    them exactly like the materialized path's validity mask did).
    """
    assert block.dst_ids is None, "layer-0 block already direct-extract"
    from ..ops.tiled import take_1d

    valid = block.neigh != EMPTY
    # invalid slots spread over DISTINCT positions (repeated indices collide
    # — collision_bench.tsv), and the composition itself goes through the
    # tiled element gather: scattered 4-byte picks at the row-gather rate
    # instead of the ~80M/s transaction rate (PERF.md, ops/tiled.py)
    spread = (
        jnp.arange(block.neigh.size, dtype=jnp.int32).reshape(
            block.neigh.shape
        )
        % pick.shape[0]
    )
    safe = jnp.where(valid, block.neigh, spread)
    neigh = jnp.where(valid, take_1d(pick, safe), EMPTY)
    dst_valid = input_nodes[: block.dst_cap] != EMPTY
    dst_ids = jnp.where(dst_valid, pick[: block.dst_cap], EMPTY)
    return block.replace(neigh=neigh, dst_ids=dst_ids)


def _rw_params(config: RunConfig):
    return (
        config.num_random_walk,
        config.random_walk_length,
        config.random_walk_restart_prob,
    )


# --------------------------------------------------------------------------
# batch packing across the A→B program seam
# --------------------------------------------------------------------------

def pack_batch(batch: SampledBatch) -> dict:
    """Flatten a SampledBatch into a dict of arrays with scalars widened to
    (1,) so every leaf can carry a sharded per-chip lane."""
    out = {
        "input_nodes": batch.input_nodes,
        "num_input": batch.num_input.reshape(1),
        "output_nodes": batch.output_nodes,
        "num_output": batch.num_output.reshape(1),
        "overflow": batch.overflow.reshape(1),
    }
    for i, b in enumerate(batch.blocks):
        out[f"neigh{i}"] = b.neigh
        out[f"ndst{i}"] = b.num_dst.reshape(1)
        out[f"nsrc{i}"] = b.num_src.reshape(1)
        if b.weights is not None:
            out[f"w{i}"] = b.weights
        if b.dst_ids is not None:
            # direct-extract blocks: dst_ids must round-trip, or _take_dst
            # would silently fall back to the (wrong) h_src prefix
            out[f"dst{i}"] = b.dst_ids
    return out


def unpack_blocks(packed: dict) -> tuple:
    blocks = []
    i = 0
    while f"neigh{i}" in packed:
        blocks.append(
            Block(
                neigh=packed[f"neigh{i}"],
                num_dst=packed[f"ndst{i}"].reshape(()),
                num_src=packed[f"nsrc{i}"].reshape(()),
                weights=packed.get(f"w{i}"),
                dst_ids=packed.get(f"dst{i}"),
            )
        )
        i += 1
    return tuple(blocks)


def _unshard(x):
    """Strip the per-chip leading lane a sharded input carries inside
    shard_map: (1, ...) → (...)."""
    return x.reshape(x.shape[1:])


def _local_topo(topo, use_dist_graph):
    if not use_dist_graph:
        return topo
    return type(topo)(
        *(None if t is None else _unshard(t) for t in topo)
    )


def _sample_any(
    topo, seeds, num_seed, key, config, fanouts, caps, seg_cap,
    axis_name, use_dist_graph, tier,
):
    if use_dist_graph:
        from .dist_topology import sample_minibatch_partitioned

        return sample_minibatch_partitioned(
            _local_topo(topo, True), seeds, num_seed, key,
            axis_name=axis_name, seg_cap=seg_cap,
            sample_type=config.sample_type, fanouts=fanouts,
            capacities=caps, rw_params=_rw_params(config),
            max_deg=config.max_degree, **tier,
        )
    return _sample_minibatch(
        topo, seeds, num_seed, key,
        sample_type=config.sample_type, fanouts=fanouts, capacities=caps,
        rw_params=_rw_params(config),
    )


# --------------------------------------------------------------------------
# fused one-program step (everything HBM-resident)
# --------------------------------------------------------------------------

def make_collocated_train_step(
    model,
    config: RunConfig,
    mesh,
    capacities,
    seg_cap: int,
    axis_name: str = DATA_AXIS,
    use_dist_graph: bool = False,
    dcn_axis=None,
    emit_input_nodes: bool = False,
):
    """Build the fused SPMD train step (100% of features/labels interleaved
    in HBM — the reference's part-cache at cache_percentage=1).

    ``emit_input_nodes``: also return per-lane ``{input_nodes, num_input}``
    (node-access analytics mode — the fused path has no other host-visible
    frontier; costs one extra D2H per step, like the reference's
    ``Profiler::LogNodeAccess``).

    With ``dcn_axis`` set (hierarchical mesh from ``make_mesh_2d``), the
    store shards over ``axis_name`` (ICI) and replicates across ``dcn_axis``
    — exchange collectives stay on the fast links, gradient psums ride both
    (the PartitionSolver-analog placement).

    Signature of the returned jitted fn::

        (state, topo, feat_parts, label_parts, seeds, num_seeds, keys, dkeys)
            -> (state, metrics)
    """
    tx = make_optimizer(config)
    fanouts = _layer_fanouts(config)
    caps = tuple(int(c) for c in capacities)
    grad_axes = (axis_name,) if dcn_axis is None else (dcn_axis, axis_name)
    batch_spec = (
        PS(axis_name) if dcn_axis is None else PS(dcn_axis, axis_name)
    )

    def per_chip(state, topo, feat_part, label_part, seeds, num_seed, key, drop_key):
        seeds = seeds.reshape(-1)
        num_seed = num_seed.reshape(())
        # keys arrive as raw uint32 data (typed key arrays don't survive
        # multi-process host staging)
        key = jax.random.wrap_key_data(key.reshape(-1))
        drop_key = jax.random.wrap_key_data(drop_key.reshape(-1))
        batch = _sample_any(
            topo, seeds, num_seed, key, config, fanouts, caps, seg_cap,
            axis_name, use_dist_graph, tier={},
        )
        feat_local = _unshard(feat_part)
        xbuf, xpick, overflow = partitioned_gather_indirect(
            feat_local, batch.input_nodes, axis_name, seg_cap
        )
        blocks = (
            _block0_via_picks(batch.blocks[0], xpick, batch.input_nodes),
        ) + tuple(batch.blocks[1:])
        lab_local = _unshard(label_part).reshape(-1, 1)
        labels, lab_overflow = partitioned_gather(
            lab_local, batch.output_nodes, axis_name, seg_cap
        )
        labels = labels[:, 0]
        # any overflow anywhere poisons the step: overflowed exchange slots
        # received another request's rows, so the whole update is skipped on
        # device (the single-chip Engine's skip path, train.make_train_step)
        skip = jax.lax.pmax(
            overflow | lab_overflow | batch.overflow, grad_axes
        )

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, blocks, xbuf, True,
                rngs={"dropout": drop_key},
            )
            return loss_fn(logits, labels, batch.num_output)

        (loss, acc), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        # seed-count-weighted cross-lane reduction (NOT pmean): a lane whose
        # shuffler shard is exhausted carries num_output=0 — an unweighted
        # mean would average its loss=0/acc=0 into the metrics and dilute
        # the gradient by live_lanes/P on ragged last steps
        w = batch.num_output.astype(jnp.float32)
        wsum = jnp.maximum(jax.lax.psum(w, grad_axes), 1.0)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * w, grad_axes) / wsum, grads
        )
        loss = jax.lax.psum(loss * w, grad_axes) / wsum
        acc = jax.lax.psum(acc * w, grad_axes) / wsum
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        keep = lambda old, new: jax.tree.map(
            lambda a, b: jnp.where(skip, a, b), old, new
        )
        new_state = TrainState(
            params=keep(state.params, params),
            opt_state=keep(state.opt_state, opt_state),
            step=state.step + 1,
        )
        metrics = {
            "loss": jnp.where(skip, jnp.nan, loss),
            # NaN the acc too: a skipped step's accuracy was computed from
            # corrupt/zeroed rows and must not pollute the epoch average
            "acc": jnp.where(skip, jnp.nan, acc),
            "exchange_overflow": skip,
        }
        if config.sanity_check:
            # on-device assert kernels (reference GPUBatchSanityCheck runs
            # in the dist archs too); flags pulled once per epoch
            from ..ops import sanity

            flags = sanity.check_batch(batch)
            for ax in grad_axes:
                flags = jax.lax.pmax(flags, ax)
            metrics["sanity"] = flags
        if emit_input_nodes:
            access = {
                "input_nodes": batch.input_nodes[None],
                "num_input": batch.num_input.reshape(1),
            }
            return new_state, metrics, access
        return new_state, metrics

    access_spec = (
        PS(axis_name) if dcn_axis is None else PS((dcn_axis, axis_name))
    )
    out_specs = (
        (PS(), PS(), {"input_nodes": access_spec, "num_input": access_spec})
        if emit_input_nodes
        else (PS(), PS())
    )
    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            PS(),  # state (replicated)
            # topology/store: sharded over ICI only, replicated across DCN
            PS(axis_name) if use_dist_graph else PS(),  # topology
            PS(axis_name),  # feat parts
            PS(axis_name),  # label parts
            batch_spec,  # seeds
            batch_spec,  # num_seeds
            batch_spec,  # sample keys
            batch_spec,  # dropout keys
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


# --------------------------------------------------------------------------
# two-phase GGMS step: A = sample + hit/miss split, B = combine + train
# --------------------------------------------------------------------------

def make_sample_split_step(
    config: RunConfig,
    mesh,
    capacities,
    seg_cap: int,
    miss_cap: int,
    axis_name: str = DATA_AXIS,
    use_dist_graph: bool = False,
    num_cache_node=None,
    host_sampler=None,
    cold_cap: int = 0,
    partitioned_cache: bool = True,
    dcn_axis=None,
):
    """Program A: sample a mini-batch per chip, gather cache hits through the
    partition exchange, compact misses for the host, gather labels.

    Returned jitted fn::

        (topo, posmap, cache_parts, label_parts, seeds, num_seeds, keys)
            -> dict(packed batch, hit_rows, miss_ids, miss_pos, num_miss,
                    num_hit, labels, overflow)

    Every output leaf is sharded over the batch axes (scalars as per-chip
    lanes); only ``miss_ids`` needs to reach the host.

    With ``dcn_axis`` set (hierarchical mesh): the topology/cache shard over
    ``axis_name`` (ICI) per group and replicate across ``dcn_axis`` — the
    exchange collectives inside stay on the fast links; batch leaves carry a
    group-major chip lane (the two-phase counterpart of
    ``make_collocated_train_step``'s DCN placement).
    """
    fanouts = _layer_fanouts(config)
    caps = tuple(int(c) for c in capacities)
    batch_spec = (
        PS(axis_name) if dcn_axis is None else PS(dcn_axis, axis_name)
    )
    lane_spec = (
        PS(axis_name) if dcn_axis is None else PS((dcn_axis, axis_name))
    )
    tier = (
        dict(
            num_cache_node=num_cache_node, host_sampler=host_sampler,
            cold_cap=cold_cap,
        )
        if num_cache_node is not None
        else {}
    )

    def per_chip(topo, posmap, cache_part, label_part, seeds, num_seed, key):
        seeds = seeds.reshape(-1)
        num_seed = num_seed.reshape(())
        key = jax.random.wrap_key_data(key.reshape(-1))
        batch = _sample_any(
            topo, seeds, num_seed, key, config, fanouts, caps, seg_cap,
            axis_name, use_dist_graph, tier,
        )
        hit_rows, miss_ids, miss_pos, num_miss, num_hit, c_of = cache_split(
            posmap, _unshard(cache_part), batch.input_nodes, axis_name,
            seg_cap, miss_cap, partitioned=partitioned_cache,
        )
        lab_local = _unshard(label_part).reshape(-1, 1)
        labels, l_of = partitioned_gather(
            lab_local, batch.output_nodes, axis_name, seg_cap
        )
        out = pack_batch(batch)
        out["overflow"] = (batch.overflow | c_of | l_of).reshape(1)
        if config.sanity_check:
            from ..ops import sanity

            out["sanity"] = sanity.check_batch(batch).reshape(1)
        out.update(
            hit_rows=hit_rows,
            miss_ids=miss_ids,
            miss_pos=miss_pos,
            num_miss=num_miss.reshape(1),
            num_hit=num_hit.reshape(1),
            labels=labels[:, 0],
        )
        return out

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            PS(axis_name) if use_dist_graph else PS(),  # topology
            PS(),  # posmap (replicated, the sampler-side cache hashtable)
            PS(axis_name),  # cache partitions
            PS(axis_name),  # label parts
            batch_spec,  # seeds
            batch_spec,  # num_seeds
            batch_spec,  # sample keys
        ),
        out_specs=lane_spec,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_combine_train_step(
    model, config: RunConfig, mesh, axis_name: str = DATA_AXIS, dcn_axis=None
):
    """Program B: scatter host-gathered miss rows into the hit rows, then
    forward/backward/psum/update with the on-device skip-on-overflow.

    Returned jitted fn::

        (state, packed, miss_rows, dkeys) -> (state, metrics)
    """
    tx = make_optimizer(config)
    grad_axes = (axis_name,) if dcn_axis is None else (dcn_axis, axis_name)
    lane_spec = (
        PS(axis_name) if dcn_axis is None else PS((dcn_axis, axis_name))
    )

    def per_chip(state, packed, miss_rows, drop_key):
        drop_key = jax.random.wrap_key_data(drop_key.reshape(-1))
        x = combine_miss(
            packed["hit_rows"],
            _unshard(miss_rows),
            packed["miss_pos"],
            packed["num_miss"].reshape(()),
        )
        blocks = unpack_blocks(packed)
        labels = packed["labels"]
        num_output = packed["num_output"].reshape(())
        skip = jax.lax.pmax(packed["overflow"].reshape(()), grad_axes)

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, blocks, x, True,
                rngs={"dropout": drop_key},
            )
            return loss_fn(logits, labels, num_output)

        (loss, acc), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        # seed-count-weighted reduction — see make_collocated_train_step
        w = num_output.astype(jnp.float32)
        wsum = jnp.maximum(jax.lax.psum(w, grad_axes), 1.0)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * w, grad_axes) / wsum, grads
        )
        loss = jax.lax.psum(loss * w, grad_axes) / wsum
        acc = jax.lax.psum(acc * w, grad_axes) / wsum
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        keep = lambda old, new: jax.tree.map(
            lambda a, b: jnp.where(skip, a, b), old, new
        )
        new_state = TrainState(
            params=keep(state.params, params),
            opt_state=keep(state.opt_state, opt_state),
            step=state.step + 1,
        )
        metrics = {
            "loss": jnp.where(skip, jnp.nan, loss),
            # NaN the acc too: a skipped step's accuracy was computed from
            # corrupt/zeroed rows and must not pollute the epoch average
            "acc": jnp.where(skip, jnp.nan, acc),
            "exchange_overflow": skip,
        }
        if config.sanity_check:
            metrics["sanity"] = jax.lax.pmax(
                packed["sanity"].reshape(()), grad_axes
            )
        return new_state, metrics

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(PS(), lane_spec, lane_spec, lane_spec),
        out_specs=(PS(), PS()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model, mesh, axis_name: str = DATA_AXIS, dcn_axis=None):
    """Forward-only B program: combine features, count correct predictions.

    Returned jitted fn:: (params, packed, miss_rows)
        -> (correct, total, overflow) (replicated scalars, psum-reduced).
    Overflowed steps (exchange/frontier capacity anywhere on the mesh)
    contribute ZERO to both counts — their feature/label rows are corrupt;
    the engine re-runs them after growing capacities so every node is
    counted exactly once.
    """
    count_axes = (axis_name,) if dcn_axis is None else (dcn_axis, axis_name)
    lane_spec = (
        PS(axis_name) if dcn_axis is None else PS((dcn_axis, axis_name))
    )

    def per_chip(params, packed, miss_rows):
        x = combine_miss(
            packed["hit_rows"],
            _unshard(miss_rows),
            packed["miss_pos"],
            packed["num_miss"].reshape(()),
        )
        blocks = unpack_blocks(packed)
        labels = packed["labels"]
        num_output = packed["num_output"].reshape(())
        of = jax.lax.pmax(packed["overflow"].reshape(()), count_axes)
        valid = 1.0 - of.astype(jnp.float32)
        logits = model.apply({"params": params}, blocks, x, False)
        n = logits.shape[0]
        mask = (jnp.arange(n) < num_output).astype(jnp.float32)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) * valid
        correct = jax.lax.psum(correct, count_axes)
        total = jax.lax.psum(
            num_output.astype(jnp.float32) * valid, count_axes
        )
        return correct, total, of

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(PS(), lane_spec, lane_spec),
        out_specs=(PS(), PS(), PS()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_fused_eval_step(
    model,
    config: RunConfig,
    mesh,
    capacities,
    seg_cap: int,
    axis_name: str = DATA_AXIS,
    use_dist_graph: bool = False,
    dcn_axis=None,
):
    """Forward-only fused program for the all-HBM path: sample → exchange
    feature/label gather → forward → psum-counted accuracy (the evaluate()
    counterpart of ``make_collocated_train_step``; reference DistEngine
    evaluation runs the same sample+extract path with the model in eval mode).

    Returned jitted fn::

        (params, topo, feat_parts, label_parts, seeds, num_seeds, keys)
            -> (correct, total, overflow)
    """
    fanouts = _layer_fanouts(config)
    caps = tuple(int(c) for c in capacities)
    count_axes = (axis_name,) if dcn_axis is None else (dcn_axis, axis_name)
    batch_spec = (
        PS(axis_name) if dcn_axis is None else PS(dcn_axis, axis_name)
    )

    def per_chip(params, topo, feat_part, label_part, seeds, num_seed, key):
        seeds = seeds.reshape(-1)
        num_seed = num_seed.reshape(())
        key = jax.random.wrap_key_data(key.reshape(-1))
        batch = _sample_any(
            topo, seeds, num_seed, key, config, fanouts, caps, seg_cap,
            axis_name, use_dist_graph, tier={},
        )
        xbuf, xpick, x_of = partitioned_gather_indirect(
            _unshard(feat_part), batch.input_nodes, axis_name, seg_cap
        )
        blocks = (
            _block0_via_picks(batch.blocks[0], xpick, batch.input_nodes),
        ) + tuple(batch.blocks[1:])
        labels, l_of = partitioned_gather(
            _unshard(label_part).reshape(-1, 1), batch.output_nodes,
            axis_name, seg_cap,
        )
        labels = labels[:, 0]
        # overflowed slots received another request's rows: exclude the
        # whole step from the counts (valid-set frontiers are never
        # calibrated, so overflow here is reachable)
        of = x_of | l_of | batch.overflow
        for ax in count_axes:
            of = jax.lax.pmax(of, ax)
        valid = 1.0 - of.astype(jnp.float32)
        logits = model.apply({"params": params}, blocks, xbuf, False)
        mask = (
            jnp.arange(logits.shape[0]) < batch.num_output
        ).astype(jnp.float32)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) * valid
        for ax in count_axes:
            correct = jax.lax.psum(correct, ax)
        total = batch.num_output.astype(jnp.float32) * valid
        for ax in count_axes:
            total = jax.lax.psum(total, ax)
        return correct, total, of

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            PS(),
            PS(axis_name) if use_dist_graph else PS(),
            PS(axis_name),
            PS(axis_name),
            batch_spec,
            batch_spec,
            batch_spec,
        ),
        out_specs=(PS(), PS(), PS()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_presample_step(
    config: RunConfig,
    mesh,
    capacities,
    seg_cap: int,
    axis_name: str = DATA_AXIS,
    use_dist_graph: bool = False,
    num_cache_node=None,
    host_sampler=None,
    cold_cap: int = 0,
    dcn_axis=None,
):
    """Presample program: run the real sampler and accumulate per-node access
    frequency into an interleave-sharded count array, all on device
    (reference ``PreSampler::DoPreSample``, dist/pre_sampler.cc:39-163 —
    worker 0 presamples there; here every chip presamples its shard and
    counts are owner-accumulated through the exchange).

    Returned jitted fn::

        (freq_parts, topo, seeds, num_seeds, keys)
            -> (freq_parts', frontier_sizes (P, L+1))

    ``frontier_sizes`` feeds capacity calibration (PredictNumNodes analog).

    With ``dcn_axis``: every chip (in every group) presamples its own batch
    shard; counts accumulate into per-chip lanes of a ``(G*P, rows)`` array
    (group-major) — the host sums over groups before ranking, since chip
    ``(g, p)`` of each group counts accesses to the same interleaved node
    shard ``p``.
    """
    fanouts = _layer_fanouts(config)
    caps = tuple(int(c) for c in capacities)
    batch_spec = (
        PS(axis_name) if dcn_axis is None else PS(dcn_axis, axis_name)
    )
    lane_spec = (
        PS(axis_name) if dcn_axis is None else PS((dcn_axis, axis_name))
    )
    size_axes = (axis_name,) if dcn_axis is None else (dcn_axis, axis_name)
    # the COUNTING exchange uses a worst-case segment (every input owned by
    # one chip): presample runs before calibration, and dropping over-cap
    # requests would under-count exactly the hottest nodes — the ones the
    # ranking exists to find.  One-off cost: (P, caps[-1]) ids.
    count_seg_cap = max(seg_cap, caps[-1])
    tier = (
        dict(
            num_cache_node=num_cache_node, host_sampler=host_sampler,
            cold_cap=cold_cap,
        )
        if num_cache_node is not None
        else {}
    )

    def per_chip(freq_part, topo, seeds, num_seed, key):
        num_parts = jax.lax.axis_size(axis_name)
        seeds = seeds.reshape(-1)
        num_seed = num_seed.reshape(())
        key = jax.random.wrap_key_data(key.reshape(-1))
        batch = _sample_any(
            topo, seeds, num_seed, key, config, fanouts, caps, seg_cap,
            axis_name, use_dist_graph, tier,
        )
        freq = _unshard(freq_part)
        # owner-side scatter-add through the exchange: ship accessed ids to
        # their owner chip, owner counts into its interleaved shard
        ids = batch.input_nodes
        valid = jnp.arange(ids.shape[0]) < batch.num_input
        masked = jnp.where(valid, ids, EMPTY)
        send, _, _, _ = plan_exchange(masked, num_parts, count_seg_cap)
        req = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
        req = req.reshape(-1)
        ok = req != EMPTY
        rows = jnp.where(ok, req // num_parts, freq.shape[0])
        freq = freq.at[rows].add(ok.astype(freq.dtype), mode="drop")
        sizes = jnp.stack(
            [batch.num_output.astype(jnp.int32)]
            + [b.num_src.astype(jnp.int32) for b in reversed(batch.blocks)]
        )
        # replicated max over chips: a single host-addressable (L+1,) array
        # even under multi-controller JAX
        sizes = jax.lax.pmax(sizes, size_axes)
        return freq[None], sizes

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            lane_spec,
            PS(axis_name) if use_dist_graph else PS(),
            batch_spec,
            batch_spec,
            batch_spec,
        ),
        out_specs=(lane_spec, PS()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_presample_static_exact_step(
    config: RunConfig,
    mesh,
    num_node: int,
    seed_cap: int,
    axis_name: str = DATA_AXIS,
    use_dist_graph: bool = False,
    dcn_axis=None,
):
    """EXACT all-neighbor static presample over the multi-chip stores
    (reference ``DoGPUSampleAllNeighbour``, ``cuda/cuda_extract_neighbour.cu``
    + ``dist/pre_sampler.cc:188-210``): per batch, count every node reachable
    within L hops of the seeds — every neighbor, not a sampled subset — once.

    The single-store engines run this as an edge-parallel bitmask closure
    (``store.presample.static_exact_ranking``).  The multi-chip re-expression
    keeps it exact WITHOUT shipping requests through the sampling exchange:

    * **partitioned topology** (``use_dist_graph``): the sources of a chip's
      local CSR rows are exactly the nodes it owns (interleaved placement),
      so one closure layer = every chip gathers all P lanes' owner-shard
      masks along its LOCAL edges, scatter-maxes into global destinations,
      and one tiled ``psum_scatter`` per layer returns the destination
      partials to their owners.  Per-batch work equals the single-store
      closure's (each chip does P lanes over 1/P of the edges); the only
      collectives are the (P, L, rows) reduce-scatter per layer and a tiny
      seed all_gather.
    * **replicated topology**: each chip closes over its own lane's batch
      locally (it holds the full CSR) and a single final ``psum_scatter``
      owner-accumulates the masks into the interleaved count shards.

    Requires the full topology HBM-resident (no host cold tier) — the tiered
    engines keep the wide-khop approximation (``static_presample_config``).

    Same signature as :func:`make_presample_step`'s returned fn; the
    ``sizes`` output is zeros (the exact program runs post-calibration).
    """
    num_layer = config.num_fanout
    batch_spec = (
        PS(axis_name) if dcn_axis is None else PS(dcn_axis, axis_name)
    )
    lane_spec = (
        PS(axis_name) if dcn_axis is None else PS((dcn_axis, axis_name))
    )

    def per_chip(freq_part, topo, seeds, num_seed, key):
        del key  # deterministic: the closure has no randomness
        P = jax.lax.axis_size(axis_name)
        p_idx = jax.lax.axis_index(axis_name)
        rows = freq_part.shape[-1]  # owned interleaved shard: node p + P*r
        seeds = seeds.reshape(-1)[:seed_cap]
        num_seed = num_seed.reshape(())
        valid = jnp.arange(seeds.shape[0]) < num_seed
        sg = jnp.where(valid, seeds, EMPTY)

        if use_dist_graph:
            topo = _local_topo(topo, True)
            # all lanes' seed lists (tiny: (P, batch_cap) ids)
            all_seeds = jax.lax.all_gather(sg, axis_name)  # (P, S)
            mine = (all_seeds != EMPTY) & (all_seeds % P == p_idx)
            tgt = jnp.where(mine, all_seeds // P, rows)
            # (P, rows) int8: lane l's running closure over MY owned nodes
            mask = jnp.zeros((all_seeds.shape[0], rows), jnp.int8)
            mask = jax.vmap(
                lambda m, t, v: m.at[t].max(v.astype(jnp.int8), mode="drop")
            )(mask, tgt, mine)
            # per-edge LOCAL source row id (static_exact_ranking's cumsum
            # trick over the local indptr); edges past iptr[rows] are padding
            iptr = topo.indptr
            n_edges = iptr[rows]
            marks = (
                jnp.zeros(topo.indices.shape[0], jnp.int32)
                .at[iptr[1:rows]]
                .add(1, mode="drop")
            )
            rowid = jnp.cumsum(marks)
            evalid = jnp.arange(topo.indices.shape[0]) < n_edges
            dst = topo.indices  # global ids
            for _ in range(num_layer):
                hit = jnp.take(mask, rowid, axis=1) * evalid.astype(jnp.int8)
                add = (
                    jnp.zeros((mask.shape[0], rows * P), jnp.int8)
                    .at[:, dst]
                    .max(hit)
                )
                # linear id v = r*P + p_owner → (rows, P); owner-major for
                # the tiled reduce-scatter back to each node's owner
                addT = add.reshape(mask.shape[0], rows, P).transpose(2, 0, 1)
                recv = jax.lax.psum_scatter(
                    addT.astype(jnp.int32), axis_name,
                    scatter_dimension=0, tiled=True,
                ).reshape(mask.shape)
                mask = jnp.maximum(mask, (recv > 0).astype(jnp.int8))
            counted = mask.sum(axis=0).astype(freq_part.dtype)
        else:
            # replicated store: close over MY lane's batch fully locally
            n_pad = rows * P
            tgt = jnp.where(sg != EMPTY, sg, n_pad)
            mask = (
                jnp.zeros(n_pad, jnp.int8)
                .at[tgt]
                .max(valid.astype(jnp.int8), mode="drop")
            )
            iptr = topo.indptr
            marks = (
                jnp.zeros(topo.indices.shape[0], jnp.int32)
                .at[iptr[1:num_node]]
                .add(1, mode="drop")
            )
            rowid = jnp.cumsum(marks)
            evalid = jnp.arange(topo.indices.shape[0]) < topo.num_edge
            for _ in range(num_layer):
                hit = mask[rowid] * evalid.astype(jnp.int8)
                add = jnp.zeros(n_pad, jnp.int8).at[topo.indices].max(hit)
                mask = jnp.maximum(mask, add)
            # one final owner-accumulation: chip p receives Σ_lanes mask_l
            # restricted to its interleaved shard
            maskT = mask.reshape(rows, P).transpose(1, 0)  # (P_owner, rows)
            counted = jax.lax.psum_scatter(
                maskT.astype(jnp.int32), axis_name,
                scatter_dimension=0, tiled=True,
            ).reshape(rows).astype(freq_part.dtype)

        sizes = jnp.zeros((num_layer + 1,), jnp.int32)
        return freq_part + counted[None], sizes

    sharded = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(
            lane_spec,
            PS(axis_name) if use_dist_graph else PS(),
            batch_spec,
            batch_spec,
            batch_spec,
        ),
        out_specs=(lane_spec, PS()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


# --------------------------------------------------------------------------
# host-side placement helpers
# --------------------------------------------------------------------------

def put_replicated(tree, mesh):
    """Replicate a pytree over the mesh (multi-process aware: under
    multi-controller JAX every process supplies the full value)."""
    sharding = NamedSharding(mesh, PS())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put_one(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(put_one, tree)


def put_sharded(arr, mesh, axis_name: str = DATA_AXIS, spec=None):
    """Shard ``arr`` along dim 0 over the mesh (multi-process aware).
    ``spec`` overrides the partition spec (e.g. 2-axis batch sharding)."""
    sharding = NamedSharding(
        mesh, spec if spec is not None else PS(axis_name)
    )
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
