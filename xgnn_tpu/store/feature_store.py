"""Feature extraction sources: HBM-resident, and tiered HBM-cache + host-RAM.

TPU-native re-expression of the reference's feature path:

- ``HBMFeatureSource`` — whole feature matrix in device HBM (the fits-in-GPU
  case; reference arch1 / full cache).
- ``TieredFeatureSource`` — the GGMS cache pipeline re-designed for TPU
  (reference ``GPUCacheManager``, ``cuda/cuda_cache_manager_device.cu``):
  a hot-row cache in HBM (prefix of a policy ranking) with a flat node→slot
  position map (the sampler-side cache hashtable,
  ``dist/dist_engine.cc:266-302``), and a host-RAM cold tier.
  ``GetMissCacheIndex``'s count/scan/compact kernels collapse to one
  argsort-based split under jit; ``GPUExtractMissData``'s zero-copy PCIe
  gather becomes a host gather + async H2D of a bucket-padded miss buffer;
  ``CombineMissData``/``CombineCacheData`` become one fused masked
  gather-scatter.

Labels stay HBM-resident (int32 per node is small even at papers100M scale),
replacing ``DoGPULabelExtract`` (dist_loops.cc:938-974).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops.unique import compact_mask_positions

EMPTY = C.EMPTY_KEY


def _bucket(n: int, minimum: int = 1024) -> int:
    """Round up to a power-of-two bucket ≥ minimum (bounds recompiles of the
    miss-combine kernel to O(log) variants)."""
    b = minimum
    while b < n:
        b *= 2
    return b


PAD_ROWS = 128  # zero-row pad block appended to gather targets: invalid
# picks spread over DISTINCT rows instead of colliding on one
# (collision_bench.tsv — parked slots serialize the transactions they hit)


@functools.partial(jax.jit, static_argnums=())
def _gather_rows(feat, ids, num_valid):
    n = ids.shape[0]
    valid = jnp.arange(n) < num_valid
    # invalid slots spread over distinct rows (their content is never read:
    # block local ids stay < num_src); parking them on row 0 serializes
    # that row's transactions
    spread = (
        jnp.arange(n, dtype=jnp.int32) * jnp.int32(127)
    ) % jnp.int32(max(feat.shape[0], 1))
    idx = jnp.where(valid & (ids != EMPTY), ids, spread)
    return jnp.take(feat, idx, axis=0, mode="clip")


@jax.jit
def _split_kernel(posmap, cache_feat, input_nodes, num_input):
    """Hit/miss split: the GetMissCacheIndex stage
    (cuda_cache_manager_device.cu:41-170) as one argsort compaction.

    ``cache_feat`` carries a PAD_ROWS zero block (appended at build):
    miss/invalid slots gather distinct zero rows, so there is no full-width
    hit-mask multiply pass and no row-0 transaction pile-up — the round-4
    collision-spread treatment applied to the two-phase cache path
    (round 5; the pre-fix path measured 225 ms/step of two-phase overhead
    at bench shapes through the tunnel)."""
    from ..ops.tiled import take_1d

    n = input_nodes.shape[0]
    num_cache = cache_feat.shape[0] - PAD_ROWS
    valid = jnp.arange(n) < num_input
    real = valid & (input_nodes != EMPTY)
    # spread the padding lookups over the posmap too (4-byte tile gather)
    id_spread = (
        jnp.arange(n, dtype=jnp.int32) * jnp.int32(127)
    ) % jnp.int32(max(posmap.shape[0], 1))
    slots = take_1d(posmap, jnp.where(real, input_nodes, id_spread))
    hit = real & (slots != EMPTY)
    miss = real & ~hit
    num_miss = jnp.sum(miss).astype(jnp.int32)
    num_hit = jnp.sum(hit).astype(jnp.int32)
    # compact miss positions to the front (stable: preserves order); first
    # num_miss entries are miss positions, the tail pads with n
    miss_pos = compact_mask_positions(miss, n)
    # pad with EMPTY (not 0) so the host gather's ids<0 fast path skips the
    # (bucket - num_miss) slack rows instead of fetching node 0 repeatedly
    miss_ids = jnp.where(
        jnp.arange(n) < num_miss,
        take_1d(input_nodes, jnp.minimum(miss_pos, n - 1)),
        EMPTY,
    )
    # cached rows gathered immediately (overlaps with host miss gather);
    # misses land on the zero pad block — no mask multiply
    row_spread = num_cache + (
        jnp.arange(n, dtype=jnp.int32) * jnp.int32(127)
    ) % jnp.int32(PAD_ROWS)
    cached = jnp.take(
        cache_feat, jnp.where(hit, slots, row_spread), axis=0, mode="clip"
    )
    return cached, miss_ids, miss_pos, num_miss, num_hit


@functools.partial(jax.jit, donate_argnums=0)
def _combine_kernel(cached, miss_rows, miss_pos, num_miss):
    """Scatter miss rows into their original positions (CombineMissData,
    cuda_cache_manager_device.cu:627-731)."""
    bucket = miss_rows.shape[0]
    n = cached.shape[0]
    tgt = jnp.where(jnp.arange(bucket) < num_miss, miss_pos[:bucket], n)
    return cached.at[tgt].set(miss_rows.astype(cached.dtype), mode="drop")


class FeatureSource:
    """Interface: map device-resident node ids to device-resident features."""

    feat_dim: int

    def extract(self, input_nodes: jax.Array, num_input) -> tuple[jax.Array, dict]:
        raise NotImplementedError


class HBMFeatureSource(FeatureSource):
    def __init__(self, feat, device=None, dtype=None):
        if isinstance(feat, jax.Array):
            # already device-resident: never round-trip through the host
            self.feat = feat.astype(dtype) if dtype else feat
        else:
            arr = jnp.asarray(np.asarray(feat), dtype=dtype)
            self.feat = jax.device_put(arr, device)
        self.feat_dim = int(self.feat.shape[1])

    def extract(self, input_nodes, num_input):
        out = _gather_rows(self.feat, input_nodes, num_input)
        return out, {"hit_rate": 1.0, "miss_bytes": 0}


class TieredFeatureSource(FeatureSource):
    """HBM hot-row cache + host-RAM cold store.

    Two miss-path modes:

    - **sync-free fixed bucket** (``miss_cap`` set, the default via
      ``for_config``): every step pulls exactly ``miss_cap`` compacted miss
      ids (one D2H), gathers that fixed bucket from host RAM, and scatters it
      back — no scalar ``num_miss``/``num_hit`` device→host syncs; hit/miss
      counts stay on device for the engine to pull once per epoch.  More
      misses than ``miss_cap`` sets the returned ``overflow`` flag (the
      engine skips the update on device and grows the bucket).
    - **dynamic bucket** (``miss_cap=None``): reads ``num_miss`` on the host
      each step and sizes the gather to the next power-of-two bucket —
      fewer gathered bytes, two extra scalar round-trips per step.
    """

    def __init__(
        self,
        feat_host: np.ndarray,
        ranking: np.ndarray,
        cache_percentage: float,
        device=None,
        dtype=None,
        host_gather=None,
        miss_cap: int | None = None,
    ):
        self.miss_cap = miss_cap
        num_node, self.feat_dim = feat_host.shape
        # host tier must be host-resident (one-time pull if device array)
        self.feat_host = (
            feat_host if isinstance(feat_host, np.ndarray) else np.asarray(feat_host)
        )
        feat_host = self.feat_host
        self.num_cache = int(num_node * cache_percentage)
        cache_ids = np.asarray(ranking[: self.num_cache], dtype=np.int64)
        posmap = np.full(num_node, EMPTY, np.int32)
        posmap[cache_ids] = np.arange(self.num_cache, dtype=np.int32)
        self.posmap = jax.device_put(jnp.asarray(posmap), device)
        if self.num_cache:
            from .. import clib

            cache_rows = clib.gather_rows(feat_host, cache_ids)
        else:
            cache_rows = np.zeros((1, self.feat_dim), feat_host.dtype)
        # PAD_ROWS zero block: miss/invalid picks spread over distinct zero
        # rows inside _split_kernel (no hit-mask multiply pass)
        cache_rows = np.concatenate(
            [cache_rows, np.zeros((PAD_ROWS, self.feat_dim), cache_rows.dtype)]
        )
        self.cache_feat = jax.device_put(jnp.asarray(cache_rows, dtype=dtype), device)
        self.device = device
        self.dtype = dtype or self.cache_feat.dtype
        # host-side gather kernel: OMP C++ (cpp/libxgnnhost.so) when built,
        # numpy fallback — the CPUExtract analog (cpu_extraction.cc)
        if host_gather is None:
            from .. import clib

            host_gather = lambda ids, out: clib.gather_rows(
                self.feat_host, ids, out
            )
        self._host_gather = host_gather

    def _split(self, input_nodes, num_input):
        # posmap/cache_feat are jit ARGUMENTS, never closure constants:
        # a captured multi-GB cache array would be hauled host-side for
        # constant fingerprinting at trace time
        return _split_kernel(self.posmap, self.cache_feat, input_nodes, num_input)

    def _combine(self, cached, miss_rows, miss_pos, num_miss):
        return _combine_kernel(cached, miss_rows, miss_pos, num_miss)

    def extract(self, input_nodes, num_input):
        cached, miss_ids, miss_pos, num_miss, num_hit = self._split(
            input_nodes, num_input
        )
        if self.miss_cap is not None:
            # sync-free path: ONE fixed-size D2H (the compacted miss ids),
            # no scalar pulls; stats stay on device
            bucket = min(self.miss_cap, input_nodes.shape[0])
            ids_host = np.asarray(miss_ids[:bucket]).astype(np.int64)
            ids_host = np.where(ids_host == EMPTY, -1, ids_host)
            padded = self._host_gather(ids_host, None)
            miss_rows = jax.device_put(jnp.asarray(padded), self.device)
            out = self._combine(cached, miss_rows, miss_pos, num_miss)
            return out, {
                "hit_rate": None,  # on-device stats below
                "num_hit": num_hit,
                "num_miss": num_miss,
                "overflow": num_miss > bucket,
                "miss_bytes": bucket * self.feat_dim * padded.dtype.itemsize,
            }
        nm = int(num_miss)  # host sync point — pipelining hides it
        # bucket ≥ nm always holds: nm ≤ cap and _bucket(nm) ≥ nm
        bucket = min(_bucket(max(nm, 1)), input_nodes.shape[0])
        ids_host = np.full(bucket, -1, np.int64)
        ids_host[:nm] = np.asarray(miss_ids[:bucket])[:nm]
        padded = self._host_gather(ids_host, None)
        miss_rows = jax.device_put(jnp.asarray(padded), self.device)
        out = self._combine(cached, miss_rows, miss_pos, num_miss)
        nh = int(num_hit)
        total = max(nm + nh, 1)
        return out, {
            "hit_rate": nh / total,
            "miss_bytes": nm * self.feat_dim * padded.dtype.itemsize,
        }

    def grow_miss_cap(self, observed: int | None = None):
        """Grow the fixed miss bucket after an overflowed epoch.  With an
        observed max miss count (the engine pulls it in the once-per-epoch
        stats sync), jump straight to the covering power-of-two bucket —
        doubling alone could take many ruined epochs to catch up."""
        if self.miss_cap is None:
            return
        target = self.miss_cap * 2
        if observed is not None:
            target = max(target, _bucket(int(observed)))
        self.miss_cap = min(target, 1 << 24)


class DynamicTieredFeatureSource(TieredFeatureSource):
    """Refreshable cache (reference ``GPUDynamicCacheManager`` / arch4,
    ``cuda/cuda_cache_manager.h:98-149``): ``refresh(ranking)`` swaps the
    cached row set to the currently-hottest nodes.  The engine accumulates
    access frequency on device and refreshes at epoch boundaries (the
    reference refreshes on a step interval using prefetched batches; epoch
    granularity avoids mid-epoch device→host syncs)."""

    def refresh(self, ranking: np.ndarray):
        num_node = self.posmap.shape[0]
        cache_ids = np.asarray(ranking[: self.num_cache], dtype=np.int64)
        posmap = np.full(num_node, EMPTY, np.int32)
        posmap[cache_ids] = np.arange(len(cache_ids), dtype=np.int32)
        self.posmap = jax.device_put(jnp.asarray(posmap), self.device)
        if len(cache_ids):
            from .. import clib

            rows = clib.gather_rows(self.feat_host, cache_ids)
            rows = np.concatenate(
                [rows, np.zeros((PAD_ROWS, self.feat_dim), rows.dtype)]
            )
            self.cache_feat = jax.device_put(
                jnp.asarray(rows, dtype=self.dtype), self.device
            )


class LabelSource:
    """HBM-resident label gather (replaces DoGPULabelExtract)."""

    def __init__(self, label, device=None):
        if isinstance(label, jax.Array):
            # already device-resident — keep it there (D2H is expensive)
            self.label = jnp.maximum(label.astype(jnp.int32), 0)
        else:
            lab = np.asarray(label)
            if lab.dtype == np.int64:
                lab = lab.astype(np.int32)
            lab = np.where(lab < 0, 0, lab)
            self.label = jax.device_put(jnp.asarray(lab), device)

    def extract(self, output_nodes, num_output):
        return _gather_rows(self.label[:, None], output_nodes, num_output)[:, 0]
