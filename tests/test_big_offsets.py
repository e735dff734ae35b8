"""64-bit edge-offset support (>= 2^31-edge graphs).

The reference's uint32 id space covers 4.29B edges (common/constant.h:75
kEmptyKey=0xffffffff); com-friendster (~3.6B directed) and mag240m-homo
(~2.6B) exceed 2^31, so their CSR edge OFFSETS do not fit int32.  The
TPU-first design (dataset.py / parallel/ggms.py / parallel/dist_topology.py):

- loader keeps the indptr mmap as uint32 when ``num_edge >= 2^31`` (values
  up to 2^32-1 read correctly) and hard-asserts ``indptr[0] == 0`` and
  ``indptr[-1] == num_edge``;
- the host tier computes offsets in int64 (HostColdSampler);
- device arrays stay int32: ``partition_csr_host`` REBASES per-part offsets
  (refusing loudly if a part would own >= 2^31 edges) and
  ``clamp_num_cache_node_int32`` shrinks hot prefixes that would not fit.

These tests mmap a crafted SPARSE 2.4B-edge CSR (a few KB on disk) through
load -> tier/partition -> sample against a NumPy oracle.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xgnn_tpu import constants as C
from xgnn_tpu.config import SampleType
from xgnn_tpu.constants import EMPTY_KEY
from xgnn_tpu.dataset import load_dataset

NUM_NODE = 64
NUM_EDGE = 2_400_000_000  # > 2^31
HEAD_DEG = 4  # rows 0..30
TAIL_DEG = 6  # rows 32..63
GIANT_ROW = 31  # owns everything between head and tail (never sampled)


def _neigh(v, j):
    """Deterministic neighbor pattern for oracle checks."""
    return (v * 7 + j * 13) % NUM_NODE


@pytest.fixture(scope="module")
def big_ds(tmp_path_factory):
    path = tmp_path_factory.mktemp("big_offsets")
    head = np.arange(0, (GIANT_ROW + 1) * HEAD_DEG, HEAD_DEG, dtype=np.int64)
    tail_start = NUM_EDGE - (NUM_NODE - GIANT_ROW - 1) * TAIL_DEG
    tail = np.arange(
        tail_start, NUM_EDGE + 1, TAIL_DEG, dtype=np.int64
    )
    indptr = np.concatenate([head, tail])
    assert indptr.shape == (NUM_NODE + 1,)
    assert indptr[GIANT_ROW] == GIANT_ROW * HEAD_DEG
    assert indptr[GIANT_ROW + 1] == tail_start > 2**31
    indptr.astype(np.uint32).tofile(path / C.INDPTR_FILE)

    idx = np.memmap(
        path / C.INDICES_FILE, dtype=np.uint32, mode="w+", shape=(NUM_EDGE,)
    )
    for v in range(NUM_NODE):
        if v == GIANT_ROW:
            continue
        s, e = int(indptr[v]), int(indptr[v + 1])
        idx[s:e] = [_neigh(v, j) for j in range(e - s)]
    idx.flush()
    del idx

    train = np.arange(16, dtype=np.uint32)
    train.tofile(path / C.TRAIN_SET_FILE)
    train.tofile(path / C.VALID_SET_FILE)
    train.tofile(path / C.TEST_SET_FILE)
    with open(path / C.META_FILE, "w") as f:
        f.write(f"{C.META_NUM_NODE} {NUM_NODE}\n")
        f.write(f"{C.META_NUM_EDGE} {NUM_EDGE}\n")
        f.write(f"{C.META_FEAT_DIM} 8\n{C.META_NUM_CLASS} 2\n")
        f.write(
            f"{C.META_NUM_TRAIN_SET} 16\n{C.META_NUM_VALID_SET} 16\n"
            f"{C.META_NUM_TEST_SET} 16\n"
        )
    return load_dataset(str(path), load_feat=False)


def _oracle_sets(v):
    deg = HEAD_DEG if v < GIANT_ROW else TAIL_DEG
    if v == GIANT_ROW:
        return None
    return {_neigh(v, j) for j in range(deg)}


def test_loader_promotes_and_reads_big_offsets(big_ds):
    assert big_ds.indptr.dtype == np.uint32  # NOT the int32 view
    assert int(big_ds.indptr[-1]) == NUM_EDGE
    assert int(big_ds.indptr[GIANT_ROW + 1]) > 2**31
    # degrees across the 2^31 boundary are exact
    d = np.diff(big_ds.indptr.astype(np.int64))
    assert d[GIANT_ROW - 1] == HEAD_DEG and d[GIANT_ROW + 1] == TAIL_DEG


def test_loader_consistency_assert(tmp_path, big_ds):
    """A truncated/corrupt indptr (or a 32-bit mis-view) trips the
    indptr[-1] == num_edge hard-assert."""
    src = os.path.dirname(big_ds.indptr.filename)
    bad = tmp_path / "bad"
    bad.mkdir()
    for f in os.listdir(src):
        os.symlink(os.path.join(src, f), bad / f)
    os.unlink(bad / C.META_FILE)
    with open(bad / C.META_FILE, "w") as f:
        f.write(f"{C.META_NUM_NODE} {NUM_NODE}\n")
        f.write(f"{C.META_NUM_EDGE} {NUM_EDGE + 5}\n")
        f.write(f"{C.META_FEAT_DIM} 8\n{C.META_NUM_CLASS} 2\n")
        f.write(
            f"{C.META_NUM_TRAIN_SET} 16\n{C.META_NUM_VALID_SET} 16\n"
            f"{C.META_NUM_TEST_SET} 16\n"
        )
    with pytest.raises(ValueError, match="indptr.bin inconsistent"):
        load_dataset(str(bad), load_feat=False)


def test_host_sampler_reads_past_2_31(big_ds):
    """The int64 host tier serves rows whose offsets exceed 2^31."""
    from xgnn_tpu.parallel.ggms import HostColdSampler

    hs = HostColdSampler(big_ds.indptr, big_ds.indices, SampleType.KHOP3)
    ids = np.array(
        [40, 63, EMPTY_KEY, 5, 33], np.int32
    )  # tail rows (big offsets), padding, head row
    out = hs(ids, np.array([1, 2], np.uint32), 4)
    for i, v in enumerate(ids):
        row = out[i][out[i] != EMPTY_KEY]
        if v == EMPTY_KEY:
            assert len(row) == 0
            continue
        assert set(row.tolist()) <= _oracle_sets(int(v))
        assert len(row) == 4  # khop3 = exactly min(K, deg) distinct
        assert len(set(row.tolist())) == 4


def test_tiered_sampler_end_to_end(big_ds):
    """load -> clamped hot prefix + int64 host tier -> multi-layer sample:
    every pick is a true neighbor on both sides of the 2^31 boundary."""
    from xgnn_tpu.config import RunConfig
    from xgnn_tpu.sampler import Sampler, make_tiered_topology

    hot, tier, num_node = make_tiered_topology(
        big_ds.indptr, big_ds.indices, 1.0, SampleType.KHOP3, cold_cap=256
    )
    # the giant row cannot go on device: the clamp must stop before it
    assert tier[0] == GIANT_ROW
    assert hot.indptr.dtype == jnp.int32
    cfg = RunConfig(
        sample_type=SampleType.KHOP3, fanout=(3, 3), batch_size=16,
        num_epoch=1,
    )
    s = Sampler(
        hot, cfg, capacities=[16, 128, 512], tier=tier, num_node=num_node
    )
    seeds = np.full(16, EMPTY_KEY, np.int32)
    seeds[:8] = [40, 63, 5, 33, 50, 2, 60, 10]  # mixed head/tail rows
    batch = s.sample(jnp.asarray(seeds), 8, jax.random.key(0))
    assert not bool(batch.overflow)
    ids = np.asarray(batch.input_nodes)[: int(batch.num_input)]
    uid = set(ids.tolist())
    assert uid <= set(range(NUM_NODE))
    for v in [40, 63, 5, 33]:
        assert v in uid  # seeds survive into the frontier closure
    # the closure may only contain seeds and true neighbors reachable from
    # them (2 hops over the oracle adjacency)
    reach = set(seeds[:8].tolist())
    for _ in range(2):
        reach = reach | {
            n for v in list(reach) if _oracle_sets(v) for n in _oracle_sets(v)
        }
    assert uid <= reach


def test_partition_rebases_big_offsets(big_ds):
    """partition_csr_host over rows living at offsets > 2^31 rebases every
    part's offsets into int32 and keeps the exact neighbor lists."""
    from xgnn_tpu.parallel.dist_topology import partition_csr_host
    from xgnn_tpu.ops import sampling

    # partition the TAIL row range (offsets 2.2B..2.4B) — the same slicing
    # arithmetic a P>=2 friendster partition performs on its own rows
    tail_view = big_ds.indptr[GIANT_ROW + 1 :]  # 33 entries, rows 32..63
    topo = partition_csr_host(tail_view, big_ds.indices, 2)
    assert topo.indptr.dtype == np.int32 and topo.indices.dtype == np.int32
    for p in range(2):
        own = np.arange(p, NUM_NODE - GIANT_ROW - 1, 2)  # local row -> global
        ip = topo.indptr[p].astype(np.int64)
        for li, lr in enumerate(own):
            v = GIANT_ROW + 1 + lr
            got = topo.indices[p][ip[li] : ip[li + 1]].tolist()
            want = [_neigh(v, j) for j in range(TAIL_DEG)]
            assert got == want, (p, v)
    # ... and device sampling over the rebased part matches the oracle
    rows = jnp.asarray(np.array([0, 5, 10, EMPTY_KEY], np.int32))
    nbr = np.asarray(
        sampling.sample_khop3(
            jnp.asarray(topo.indptr[0]), jnp.asarray(topo.indices[0]),
            rows, 4, jax.random.key(0),
        )
    )
    for i, lr in enumerate([0, 5, 10]):
        v = GIANT_ROW + 1 + 2 * lr  # part 0 owns even local rows
        got = set(nbr[i][nbr[i] != EMPTY_KEY].tolist())
        assert got <= _oracle_sets(v) and len(got) == 4


def test_partition_refuses_giant_part(big_ds):
    """A part that would own >= 2^31 edges is refused BEFORE materializing
    (the giant row alone holds ~2.2B edges)."""
    from xgnn_tpu.parallel.dist_topology import partition_csr_host

    with pytest.raises(ValueError, match="2\\^31"):
        partition_csr_host(big_ds.indptr, big_ds.indices, 2)


def test_single_store_graph_refuses_big_offsets(big_ds):
    from xgnn_tpu.types import Graph

    with pytest.raises(ValueError, match="2\\^31"):
        Graph.from_dataset(big_ds)


def test_clamp_num_cache_node(big_ds):
    from xgnn_tpu.parallel.ggms import clamp_num_cache_node_int32

    # full prefix does not fit; the largest feasible prefix stops at the
    # giant row for any P where some part owns it
    assert clamp_num_cache_node_int32(big_ds.indptr, NUM_NODE, 1) == GIANT_ROW
    # P=2: part 1 owns row 31 -> same clamp
    assert clamp_num_cache_node_int32(big_ds.indptr, NUM_NODE, 2) == GIANT_ROW
    # small prefixes pass through untouched
    assert clamp_num_cache_node_int32(big_ds.indptr, 10, 4) == 10
