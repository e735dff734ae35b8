"""Run configuration.

Dataclass mirror of the reference's global ``RunConfig`` static struct
(``samgraph/common/run_config.h:31-133``) and its string-map loader
(``samgraph/common/operation.cc:64-326``).  One config object is threaded
through the engine instead of process-global statics — JAX is functional and
a single host process drives all local chips, so no cross-process config
broadcast is needed.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from enum import Enum
from typing import Optional, Sequence

from . import constants


class SampleType(Enum):
    """Sampling algorithms (reference common.h:50-59)."""

    # khop0/khop2/khop3 are all uniform WITHOUT replacement (khop0: warp
    # reservoir; khop2's compiled ORIGIN variant: in-place Fisher-Yates;
    # khop3: draw-until-K-distinct hash set == uniform K-subset) — the
    # reference keeps three kernels for their GPU thread mappings, the TPU
    # build shares one Fisher-Yates kernel (ops/sampling.py docstring).
    KHOP0 = "khop0"
    KHOP1 = "khop1"  # the outlier: with-replacement draws + duplicate-pair
    #                  compact (cuda_sampling_khop1.cu) — can return fewer
    #                  than min(K, deg) distinct picks.
    KHOP2 = "khop2"
    KHOP3 = "khop3"  # XGNN default
    WEIGHTED_KHOP = "weighted_khop"  # alias-table weighted
    WEIGHTED_KHOP_PREFIX = "weighted_khop_prefix"  # prefix-sum binary search
    WEIGHTED_KHOP_HASH_DEDUP = "weighted_khop_hash_dedup"  # alias + dedup
    RANDOM_WALK = "random_walk"  # PinSAGE random walk + top-K frequency


class CachePolicy(Enum):
    """Hot-vertex cache rankings (reference common.h:86-95)."""

    DEGREE = "degree"
    HEURISTIC = "heuristic"
    PRE_SAMPLE = "pre_sample"  # frequency ranking from presample epochs (default)
    DEGREE_HOP = "degree_hop"
    PRE_SAMPLE_STATIC = "presample_static"
    FAKE_OPTIMAL = "fake_optimal"
    DYNAMIC = "dynamic_cache"
    RANDOM = "random"


class RunArch(Enum):
    """Execution architectures, re-expressed for TPU.

    The reference's arch0-9 matrix (common.h:61-81) collapses on TPU: one
    process per host drives all local chips, so the fork/IPC split between
    arch variants disappears.  What remains meaningful:

    - ``SINGLE``   — one chip samples + extracts + trains (reference arch1).
    - ``COLLOCATED`` — every chip samples/extracts/trains over a sharded
      store + data-parallel model (reference arch6, the XGNN headline).
    - ``DISAGGREGATED`` — dedicated sampler chips feed trainer chips
      (reference arch5 / FGNN), expressed as mesh role-split.
    """

    SINGLE = "single"
    COLLOCATED = "collocated"
    DISAGGREGATED = "disaggregated"


_ARCH_ALIASES = {
    # reference arch names → TPU arch
    "arch1": RunArch.SINGLE,
    "arch2": RunArch.SINGLE,
    "arch3": RunArch.SINGLE,
    "arch4": RunArch.SINGLE,
    "arch5": RunArch.DISAGGREGATED,
    "arch6": RunArch.COLLOCATED,
    "arch7": RunArch.COLLOCATED,
    "single": RunArch.SINGLE,
    "collocated": RunArch.COLLOCATED,
    "disaggregated": RunArch.DISAGGREGATED,
}


@dataclasses.dataclass
class RunConfig:
    # --- dataset -----------------------------------------------------------
    root_path: str = "/graph-learning/samgraph/"
    dataset: str = "products"

    # --- execution ---------------------------------------------------------
    arch: RunArch = RunArch.SINGLE
    sample_type: SampleType = SampleType.KHOP3
    num_epoch: int = 10
    batch_size: int = 8000
    fanout: Sequence[int] = (15, 10, 5)
    num_worker: int = 1  # data-parallel chips (reference num_worker, arch6)
    # hierarchical mesh: shard the GGMS store within each group of
    # num_worker/num_dcn_groups chips (ICI) and replicate it across groups
    # (DCN/multi-host) — the topology-aware-placement analog
    # (PartitionSolver, dist_graph.cu:684-777)
    num_dcn_groups: int = 1
    # per-peer exchange segment headroom over the even split ceil(cap/P).
    # Interleaved (id % P) placement balances requests to within 8% at small
    # counts and 0.3% at bench shapes (evaluation/scaling/
    # measured_traffic.tsv), so 1.25x covers the imbalance with margin; a
    # pathological step overflows and is REPLAYED at grown capacity (the
    # engines' overflow-replay path), so this is a perf knob, not a
    # correctness one.  Round 2 shipped 2.0x, paying ~2.5x useful bytes on
    # every all_to_all and double the owner-side sampling work.
    exchange_headroom: float = 1.25
    num_sample_worker: int = 1  # disaggregated mode only (reference arch5)
    num_train_worker: int = 1
    # adaptive sampler/trainer re-role at epoch boundaries (the
    # balance_switcher analog, example/samgraph/balance_switcher/: there a
    # sampler GPU joins training once its sampling work drains; on TPU the
    # role split is re-chosen between epochs from the measured sample/train
    # balance and the programs are rebuilt once per change)
    balance_switcher: bool = False
    pipeline: bool = True  # overlap sample(n+1) with train(n)
    prefetch_depth: int = 2  # bounded GraphPool analog depth
    # fuse the WHOLE epoch into one lax.scan device program (sample +
    # extract + train per scan step): zero host dispatches between steps.
    # No reference analog (its loop is host-driven by design); requires the
    # all-HBM feature path and no per-step host-side instrumentation —
    # the engine falls back to the host loop otherwise.  Identical numerics
    # to the host loop (same key folding, same shuffle order).
    device_loop: bool = False

    # --- model -------------------------------------------------------------
    model: str = "graphsage"
    num_hidden: int = 256
    num_layer: int = 3
    lr: float = 0.003
    dropout: float = 0.5
    weight_decay: float = 0.0
    num_head: int = 1  # GAT
    compute_dtype: str = "float32"  # or "bfloat16" for MXU-friendly training
    # rematerialize each GNN layer in the backward pass (jax.checkpoint):
    # recompute instead of storing per-layer intermediates.  Since the
    # aggregate-first reorder (models/gnn.py GCNConv/GATConv) no model
    # materializes a (src_cap, hidden) activation, so this is only needed
    # for unusually wide hidden dims or many-head GAT at huge frontiers
    remat: bool = False
    # fanout-aggregation formulation: "loop" = unrolled K gather+FMA passes,
    # "tiled" = ops/fanout.fanout_reduce_tiled (scan over dst tiles, one
    # output write, custom-VJP backward) — see PERF.md "accumulator tax"
    agg_impl: str = "loop"
    # on-device feature-table storage dtype: "bfloat16" halves every
    # extract/aggregation gather byte (accumulation stays float32; see
    # PERF.md).  The host tier keeps the dataset's dtype.
    feat_dtype: str = "float32"

    # --- cache / store (GGMS analog) --------------------------------------
    cache_policy: CachePolicy = CachePolicy.PRE_SAMPLE
    cache_percentage: float = 0.0
    presample_epoch: int = 1
    # presample_static counts frequencies over the ALL-neighbor expansion
    # (reference DoGPUSampleAllNeighbour, cuda/pre_sampler.cc:69-74); on TPU
    # the expansion is truncated at this static per-node fanout (khop0 with
    # fanout >= degree emits every neighbor exactly once)
    presample_static_fanout: int = 32
    use_dist_graph: bool = False  # shard topology across the chip mesh
    # direct in-device feature extraction (the reference --gpu-extract,
    # operation.cc / dist_engine.cc:238-244, re-expressed for TPU): when the
    # whole feature matrix is HBM-resident and the model aggregates before
    # transforming (GraphSAGE/PinSAGE), the last sampling layer keeps global
    # ids and the first GNN layer gathers features straight from the table —
    # no last-layer dedup sort, no separate extract stage
    gpu_extract: bool = True
    # fraction of EDGES whose owner rows live device-resident when
    # use_dist_graph is on; the remaining nodes' adjacency stays in host RAM
    # as the last-level partition (reference dist_graph_percentage,
    # dist_engine.cc:224-235 computes num_cache_node from it;
    # DeviceDistGraph slot num_partition, dist_graph.h:141-151)
    dist_graph_percentage: float = 1.0
    part_cache: bool = False  # shard the feature cache across the chip mesh
    # solve dist_graph_percentage / cache_percentage / use_dist_graph from
    # the per-chip HBM budget and access skew at init (the PartitionSolver
    # analog, parallel/placement.py); explicit user values win
    auto_placement: bool = False
    # per-chip HBM override for auto_placement (GiB); default asks the
    # platform (jax memory_stats), required on CPU meshes which report none
    hbm_budget_gb: Optional[float] = None

    # --- random walk (PinSAGE, reference run_config.h:60-66) ---------------
    random_walk_length: int = 3
    random_walk_restart_prob: float = 0.5
    num_random_walk: int = 4
    num_neighbor: int = 5
    num_layer_pinsage: int = 2

    # --- capacity planning (static-shape sampling) -------------------------
    # Per-layer frontier capacities.  None → calibrated from warmup batches
    # with ALLOC_SCALE headroom (the PredictNumNodes analog,
    # reference common.h:311-317).
    frontier_capacities: Optional[Sequence[int]] = None
    # static max out-degree of the loaded graph — set by the engines at
    # load time; sizes the weighted-prefix binary search (Graph.n_max_deg
    # carries it on the single-store path)
    max_degree: Optional[int] = None
    calibration_batches: int = 3

    # --- checkpointing (improvement over reference — SURVEY §5.4) ----------
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1  # epochs

    # --- misc --------------------------------------------------------------
    seed: int = 42
    # dynamic-cache refresh gate (reference cuda_loops_arch4.cc:203): the
    # refreshable cache re-ranks at epoch end when ``barriered_epoch == -1``
    # (every epoch, the default here as 0 ≡ -1) or ``epoch == barriered_epoch``
    barriered_epoch: int = -1
    report_acc: int = 0
    profile_level: int = 0
    sanity_check: bool = False
    dump_trace: bool = False

    def __post_init__(self):
        if isinstance(self.arch, str):
            self.arch = _ARCH_ALIASES[self.arch]
        if isinstance(self.sample_type, str):
            self.sample_type = SampleType(self.sample_type)
        if isinstance(self.cache_policy, str):
            self.cache_policy = CachePolicy(self.cache_policy)
        self.fanout = tuple(int(f) for f in self.fanout)
        if self.model == "pinsage" and self.sample_type != SampleType.RANDOM_WALK:
            # PinSAGE is the random-walk path (reference train_pinsage.py):
            # a khop sampler would emit num_layer blocks for a
            # num_layer_pinsage-layer model — a shape mismatch at the loss
            logging.getLogger(__name__).warning(
                "model=pinsage requires random_walk sampling; overriding "
                "sample_type=%s", self.sample_type,
            )
            self.sample_type = SampleType.RANDOM_WALK
        self._load_env()

    def _load_env(self):
        """Env-var overrides (reference run_config.cc:110-160)."""
        env = os.environ
        if constants.ENV_PROFILE_LEVEL in env:
            self.profile_level = int(env[constants.ENV_PROFILE_LEVEL])
        if constants.ENV_SANITY_CHECK in env:
            self.sanity_check = env[constants.ENV_SANITY_CHECK] not in ("", "0")
        if constants.ENV_DUMP_TRACE in env:
            self.dump_trace = env[constants.ENV_DUMP_TRACE] not in ("", "0")

    @property
    def num_fanout(self) -> int:
        return len(self.fanout)

    @property
    def dataset_path(self) -> str:
        return os.path.join(self.root_path, self.dataset)

    @classmethod
    def from_dict(cls, conf: dict) -> "RunConfig":
        """Build from a reference-style string map.

        Accepts the key names used by the reference examples
        (``example/samgraph/common_config.py`` + ``operation.cc:64-326``);
        unknown keys are ignored so reference run scripts port over.
        """
        field_names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in conf.items() if k in field_names}
        return cls(**known)

    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        out["arch"] = self.arch.value
        out["sample_type"] = self.sample_type.value
        out["cache_policy"] = self.cache_policy.value
        return out

    def print_run_config(self):
        """stdout contract: ``config:key=value`` lines parsed by the
        evaluation harness (reference common_config.py:236-245)."""
        for k, v in sorted(self.to_dict().items()):
            print(f"config:{k}={v}")
