"""Multi-layer mini-batch sampler.

TPU-native re-expression of the reference's ``DoGPUSample`` stage
(``samgraph/common/dist/dist_loops.cc:62-368``): per layer — sample a fixed
fanout from the current frontier, dedup into a new compact frontier
(``OrderedHashTable::FillWithDuplicates`` → ``ops.unique_ordered``), and
remap neighbor ids to frontier-local indices (``GPUMapEdges`` →
the remap output of ``unique_ordered``).  Everything is statically shaped
and jitted once per capacity configuration.

Capacity planning: ragged frontier sizes become padded static capacities.
Defaults come from a calibration pass over warmup batches scaled by
``ALLOC_SCALE`` (the ``PredictNumNodes`` analog, reference
common.h:311-317); runtime overflow is flagged in the batch and the engine
rebuilds with grown capacities.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .config import RunConfig, SampleType
from .ops import sampling, unique
from .ops.random_walk import sample_random_walk
from .types import Block, Graph, SampledBatch

EMPTY = C.EMPTY_KEY


def _align(n: int, num_node: int) -> int:
    a = C.CAPACITY_ALIGN
    return min(int(np.ceil(num_node / a)) * a, int(np.ceil(n / a)) * a)


def default_capacities(
    batch_size: int, fanouts: Sequence[int], num_node: int
) -> list[int]:
    """Worst-case per-layer frontier capacities (cap_{l+1} = cap_l*(K+1)),
    clamped to the node count.  Safe but loose — calibration tightens."""
    caps = [_align(batch_size, num_node)]
    for k in fanouts:
        caps.append(_align(caps[-1] * (k + 1), num_node))
    return caps


def _layer_fanouts(config: RunConfig) -> tuple[int, ...]:
    if config.sample_type == SampleType.RANDOM_WALK:
        return tuple([config.num_neighbor] * config.num_layer_pinsage)
    return tuple(config.fanout)


def make_tiered_topology(
    indptr: np.ndarray,
    indices: np.ndarray,
    percentage: float,
    sample_type: SampleType,
    prob_table: Optional[np.ndarray] = None,
    alias_table: Optional[np.ndarray] = None,
    prob_prefix_table: Optional[np.ndarray] = None,
    device=None,
    cold_cap: int = 0,
):
    """Build a single-store tiered topology: the hot node-id prefix (sized
    so its edges consume ``percentage`` of all edges,
    reference dist_engine.cc:224-235) lives on device; everything else is
    served from the host CSR by a :class:`HostColdSampler` callback.

    Returns ``(hot_graph, tier, num_node)`` ready for
    ``Sampler(hot_graph, cfg, tier=tier, num_node=num_node)`` — the
    single-chip/out-of-core mode (reference ``evaluation/large_graph``
    ``--use-dist-graph 0.85`` on one GPU) and the arch5 sampler tier.
    """
    from types import SimpleNamespace

    from .parallel.ggms import (
        HostColdSampler,
        clamp_num_cache_node_int32,
        compute_num_cache_node,
    )

    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    ncn = compute_num_cache_node(indptr, percentage)
    # >= 2^31-edge graphs (uint32 loader indptr): the device prefix is
    # clamped so its offsets fit int32; the int64 host tier serves the rest
    ncn = clamp_num_cache_node_int32(indptr, ncn, 1)
    if ncn < len(indptr) - 1:
        from .parallel.ggms import host_callbacks_supported

        if not host_callbacks_supported():
            raise RuntimeError(
                "cold topology tier needs jax.pure_callback (host "
                "send/recv) — unsupported on this runtime (the axon tunnel "
                "plugin); run with dist_graph_percentage=1.0 / the "
                "partitioned store, or on a standard CPU/GPU/TPU runtime"
            )
    e = int(indptr[ncn])
    sl = lambda t: None if t is None else np.asarray(t)[:e]
    ns = SimpleNamespace(
        indptr=indptr[: ncn + 1].astype(np.int32),
        indices=indices[:e],
        prob_table=sl(prob_table),
        alias_table=sl(alias_table),
        prob_prefix_table=sl(prob_prefix_table),
        num_node=ncn,
        num_edge=e,
    )
    weighted = sample_type in (
        SampleType.WEIGHTED_KHOP,
        SampleType.WEIGHTED_KHOP_PREFIX,
        SampleType.WEIGHTED_KHOP_HASH_DEDUP,
    )
    hot = Graph.from_dataset(ns, device, weighted=weighted)
    # walk steps are fanout-1 uniform-with-replacement draws
    host_st = (
        C.UNIFORM_WR if sample_type == SampleType.RANDOM_WALK
        else sample_type
    )
    host_sampler = HostColdSampler(
        indptr, indices, host_st,
        prob_table=prob_table, alias_table=alias_table,
        prob_prefix_table=prob_prefix_table,
    )
    tier = (ncn, host_sampler, cold_cap)
    return hot, tier, len(indptr) - 1


class Sampler:
    """Builds and owns the jitted multi-layer sampling function.

    One instance per (graph, capacity set); rebuilt on capacity overflow.
    """

    def __init__(
        self,
        graph: Graph,
        config: RunConfig,
        capacities: Optional[Sequence[int]] = None,
        direct_extract: bool = False,
        tier: Optional[tuple] = None,
        num_node: Optional[int] = None,
    ):
        """``tier``: optional ``(num_cache_node, host_sampler, cold_cap)`` —
        the graph holds only the hot node-id prefix on device and frontier
        nodes beyond it draw through the host callback (the reference's
        single-GPU out-of-core mode, ``evaluation/large_graph/run.sh``
        ``--use-dist-graph 0.85``, and the arch5 sampler tier).
        ``num_node``: FULL node count for capacity clamping when the graph
        on device is a truncated hot prefix."""
        self.graph = graph
        self.config = config
        self.fanouts = _layer_fanouts(config)
        self.direct_extract = direct_extract
        self.tier = tier
        self.num_node = num_node or graph.num_node
        num_node = self.num_node
        if capacities is None:
            capacities = config.frontier_capacities
        if capacities is None:
            capacities = default_capacities(
                config.batch_size, self.fanouts, num_node
            )
        self.capacities = list(int(c) for c in capacities)
        assert len(self.capacities) == len(self.fanouts) + 1
        self._fn = jax.jit(
            functools.partial(
                _sample_minibatch,
                sample_type=config.sample_type,
                fanouts=self.fanouts,
                capacities=tuple(self.capacities),
                rw_params=(
                    config.num_random_walk,
                    config.random_walk_length,
                    config.random_walk_restart_prob,
                ),
                direct_extract=direct_extract,
                tier=tier,
            )
        )

    def sample(self, seeds: jax.Array, num_seed, key) -> SampledBatch:
        """Sample one mini-batch.

        ``seeds``: (batch_cap,) int32 global train-node ids, EMPTY padded.
        """
        return self._fn(self.graph, seeds, jnp.asarray(num_seed, jnp.int32), key)

    def grow(self, factor: float = 2.0) -> "Sampler":
        """Return a sampler with scaled capacities (overflow response)."""
        caps = [self.capacities[0]] + [
            _align(int(c * factor), self.num_node)
            for c in self.capacities[1:]
        ]
        tier = self.tier
        if tier is not None:
            tier = (tier[0], tier[1], int(tier[2] * factor))
        return Sampler(
            self.graph, self.config, caps,
            direct_extract=self.direct_extract,
            tier=tier, num_node=self.num_node,
        )


def _sample_layer(graph: Graph, frontier, fanout, key, sample_type, rw_params):
    st = SampleType
    weights = None
    if sample_type == st.KHOP0:
        nbr = sampling.sample_khop0(graph.indptr, graph.indices, frontier, fanout, key)
    elif sample_type == st.KHOP1:
        nbr = sampling.sample_khop1(graph.indptr, graph.indices, frontier, fanout, key)
    elif sample_type == st.KHOP2:
        nbr = sampling.sample_khop2(graph.indptr, graph.indices, frontier, fanout, key)
    elif sample_type == st.KHOP3:
        nbr = sampling.sample_khop3(graph.indptr, graph.indices, frontier, fanout, key)
    elif sample_type == st.WEIGHTED_KHOP:
        nbr = sampling.sample_weighted_khop(
            graph.indptr, graph.indices, graph.prob_table, graph.alias_table,
            frontier, fanout, key,
        )
    elif sample_type == st.WEIGHTED_KHOP_HASH_DEDUP:
        nbr = sampling.sample_weighted_khop_hash_dedup(
            graph.indptr, graph.indices, graph.prob_table, graph.alias_table,
            frontier, fanout, key,
        )
    elif sample_type == st.WEIGHTED_KHOP_PREFIX:
        nbr = sampling.sample_weighted_khop_prefix(
            graph.indptr, graph.indices, graph.prob_prefix_table,
            frontier, fanout, key, max_deg=graph.n_max_deg,
            coarse_cdf=graph.coarse_cdf,
        )
    elif sample_type == st.RANDOM_WALK:
        num_rw, rw_len, restart = rw_params
        nbr, weights, _ = sample_random_walk(
            graph.indptr, graph.indices, frontier, fanout, key,
            num_random_walk=num_rw,
            random_walk_length=rw_len,
            restart_prob=restart,
        )
    else:
        raise NotImplementedError(sample_type)
    return nbr, weights


def _sample_minibatch(
    graph: Graph,
    seeds: jax.Array,
    num_seed: jax.Array,
    key: jax.Array,
    *,
    sample_type: SampleType,
    fanouts: tuple,
    capacities: tuple,
    rw_params: tuple,
    direct_extract: bool = False,
    tier: Optional[tuple] = None,
) -> SampledBatch:
    """The jitted sampling pipeline (innermost layer first, like the
    reference's ``for layer = L-1..0`` loop, dist_loops.cc:120-355).

    ``direct_extract`` (the gpu_extract analog): the LAST layer skips
    dedup/remap entirely — its block keeps GLOBAL neighbor ids that index
    the HBM feature table directly inside the first GNN layer's aggregation,
    eliminating both the dominant dedup sort and the separate extract stage
    (measured: ~57 ms of a ~234 ms step at bench scale).  Valid only when
    the whole feature matrix is device-resident; every model in the zoo
    consumes global-id blocks (SAGE/PinSAGE via ``Block.dst_ids``, GCN/GAT
    natively since the aggregate-first reorder).
    """
    frontier = seeds
    num_frontier = num_seed
    blocks = []
    overflow = jnp.zeros((), jnp.bool_)
    for layer, fanout in enumerate(fanouts):
        last = layer == len(fanouts) - 1
        key, k_layer = jax.random.split(key)
        if tier is not None:
            # tiered topology: the device graph holds only the hot node-id
            # prefix; frontier nodes beyond it draw from the host CSR
            # (the reference's host whole-graph partition slot,
            # dist_graph.h:141-151, single-store edition)
            from .parallel.ggms import cold_sample_callback

            if sample_type == SampleType.RANDOM_WALK:
                # every walk STEP splits hot/cold itself (walkers move)
                num_rw, rw_len, restart = rw_params
                nbr, weights, t_of = sample_random_walk(
                    graph.indptr, graph.indices, frontier, fanout, k_layer,
                    num_random_walk=num_rw, random_walk_length=rw_len,
                    restart_prob=restart, tier=tier,
                )
                overflow = overflow | t_of
            else:
                num_cache_node, host_sampler, cold_cap = tier
                hot = jnp.where(
                    (frontier != EMPTY) & (frontier < num_cache_node),
                    frontier, EMPTY,
                )
                nbr, weights = _sample_layer(
                    graph, hot, fanout, k_layer, sample_type, rw_params
                )
                cold_neigh, cold_mask, cold_of = cold_sample_callback(
                    host_sampler, frontier, jax.random.key_data(k_layer),
                    fanout, num_cache_node, cold_cap,
                )
                nbr = jnp.where(cold_mask[:, None], cold_neigh, nbr)
                overflow = overflow | cold_of
        else:
            nbr, weights = _sample_layer(
                graph, frontier, fanout, k_layer, sample_type, rw_params
            )
        if direct_extract and last:
            blocks.append(
                Block(
                    neigh=nbr,  # GLOBAL ids — index the feat table directly
                    num_dst=num_frontier,
                    num_src=jnp.asarray(graph.num_node, jnp.int32),
                    weights=weights,
                    dst_ids=frontier,
                )
            )
            break
        ids = jnp.concatenate([frontier, nbr.reshape(-1)])
        out_cap = capacities[layer + 1]
        uids, num_unique, local = unique.unique_seeded(
            ids, num_frontier, frontier.shape[0], out_cap
        )
        neigh_local = local[frontier.shape[0] :].reshape(nbr.shape)
        blocks.append(
            Block(
                neigh=neigh_local,
                num_dst=num_frontier,
                num_src=num_unique,
                weights=weights,
            )
        )
        overflow = overflow | (num_unique > out_cap)
        frontier = uids
        num_frontier = jnp.minimum(num_unique, out_cap)

    blocks.reverse()  # DGL order: outermost (largest src) first
    return SampledBatch(
        blocks=tuple(blocks),
        input_nodes=frontier,
        num_input=num_frontier,
        output_nodes=seeds,
        num_output=num_seed,
        key=key,
        overflow=overflow,
    )
