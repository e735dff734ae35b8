"""Golden-value tests for ordered dedup/remap vs a NumPy oracle.

Covers the contract of the reference OrderedHashTable
(FillWithDuplicates/GPUMapEdges): unique preserving insertion order, seeds
keep prefix positions, correct o2n remap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgnn_tpu.constants import EMPTY_KEY
from xgnn_tpu.ops.unique import unique_ordered


def np_unique_ordered(ids):
    seen, out = {}, []
    local = np.full(len(ids), EMPTY_KEY, np.int64)
    for i, v in enumerate(ids):
        if v == EMPTY_KEY:
            continue
        if v not in seen:
            seen[v] = len(out)
            out.append(v)
        local[i] = seen[v]
    return np.array(out, np.int64), local


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,vocab,empty_frac", [(64, 16, 0.0), (256, 50, 0.3), (1000, 999, 0.1)])
def test_unique_ordered_matches_oracle(seed, n, vocab, empty_frac):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, n).astype(np.int32)
    ids[rng.random(n) < empty_frac] = EMPTY_KEY
    cap = vocab + 8

    uids, num_unique, local = jax.jit(
        lambda x: unique_ordered(x, cap)
    )(jnp.asarray(ids))
    uids, num_unique, local = map(np.asarray, (uids, num_unique, local))

    exp_uids, exp_local = np_unique_ordered(ids)
    assert num_unique == len(exp_uids)
    np.testing.assert_array_equal(uids[: len(exp_uids)], exp_uids)
    assert np.all(uids[len(exp_uids):] == EMPTY_KEY)
    np.testing.assert_array_equal(local, exp_local)


def test_prefix_property():
    """Previous frontier passed first keeps local ids 0..U-1 in order."""
    prev = np.array([7, 3, 9, 11], np.int32)
    nbrs = np.array([3, 9, 42, 7, 42, EMPTY_KEY, 11, 5], np.int32)
    ids = np.concatenate([prev, nbrs])
    uids, num_unique, local = unique_ordered(jnp.asarray(ids), 16)
    np.testing.assert_array_equal(np.asarray(local[:4]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(uids[:6]), [7, 3, 9, 11, 42, 5])
    assert int(num_unique) == 6


def test_all_empty():
    ids = jnp.full((32,), EMPTY_KEY, jnp.int32)
    uids, num_unique, local = unique_ordered(ids, 8)
    assert int(num_unique) == 0
    assert np.all(np.asarray(uids) == EMPTY_KEY)
    assert np.all(np.asarray(local) == EMPTY_KEY)


def test_overflow_detection():
    ids = jnp.arange(100, dtype=jnp.int32)
    _, num_unique, _ = unique_ordered(ids, 50)
    assert int(num_unique) == 100  # caller sees overflow: num_unique > cap


def test_unique_seeded_matches_oracle():
    from xgnn_tpu.ops.unique import unique_seeded

    rng = np.random.default_rng(4)
    prev_cap, n_nbr, vocab = 32, 200, 60
    prev_valid = 20
    prev = np.full(prev_cap, EMPTY_KEY, np.int32)
    prev[:prev_valid] = rng.choice(vocab, prev_valid, replace=False)
    nbrs = rng.integers(0, vocab, n_nbr).astype(np.int32)
    nbrs[rng.random(n_nbr) < 0.2] = EMPTY_KEY
    ids = np.concatenate([prev, nbrs])
    cap = vocab + 8

    uids, num_unique, local = jax.jit(
        lambda x: unique_seeded(x, prev_valid, prev_cap, cap)
    )(jnp.asarray(ids))
    uids, num_unique, local = map(np.asarray, (uids, num_unique, local))

    # prev prefix keeps its local ids
    np.testing.assert_array_equal(uids[:prev_valid], prev[:prev_valid])
    np.testing.assert_array_equal(local[:prev_valid], np.arange(prev_valid))
    # set of uniques matches oracle; new nodes ascending
    exp_set = set(ids[ids != EMPTY_KEY].tolist())
    got = uids[uids != EMPTY_KEY]
    assert num_unique == len(exp_set) == len(got)
    assert set(got.tolist()) == exp_set
    new_part = uids[prev_valid:num_unique]
    assert np.all(np.diff(new_part) > 0)
    # every input resolves to its id's slot
    for i, v in enumerate(ids):
        if v == EMPTY_KEY:
            assert local[i] == EMPTY_KEY
        else:
            assert uids[local[i]] == v


def test_unique_seeded_packed_equivalent():
    """The packed-key variant is bit-identical to unique_seeded."""
    from xgnn_tpu.ops.unique import unique_seeded, unique_seeded_packed

    rng = np.random.default_rng(11)
    for trial in range(5):
        prev_cap, n_nbr, vocab = 64, 500, 150
        prev_valid = int(rng.integers(0, prev_cap))
        pool = rng.choice(vocab, max(prev_valid, 1), replace=False)
        prev = np.full(prev_cap, EMPTY_KEY, np.int32)
        prev[:prev_valid] = pool[:prev_valid]
        nbrs = rng.integers(0, vocab, n_nbr).astype(np.int32)
        nbrs[rng.random(n_nbr) < 0.3] = EMPTY_KEY
        ids = jnp.asarray(np.concatenate([prev, nbrs]))
        cap = vocab + 8

        a = jax.jit(lambda x: unique_seeded(x, prev_valid, prev_cap, cap))(ids)
        b = jax.jit(
            lambda x: unique_seeded_packed(x, prev_valid, prev_cap, cap)
        )(ids)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# pick_multiplicity (ops/degree.py): scatter-free bincount[neigh] per pick
# ---------------------------------------------------------------------------

from xgnn_tpu.ops.degree import pick_multiplicity


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "shape,vocab,empty_frac",
    [((7, 5), 9, 0.0), ((64, 10), 40, 0.3), ((1, 3), 4, 0.9), ((16, 4), 2, 0.0)],
)
def test_pick_multiplicity_matches_bincount(seed, shape, vocab, empty_frac):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, shape).astype(np.int32)
    ids[rng.random(shape) < empty_frac] = EMPTY_KEY

    got = np.asarray(jax.jit(pick_multiplicity)(jnp.asarray(ids)))

    flat = ids.reshape(-1)
    valid = flat != EMPTY_KEY
    bc = np.bincount(flat[valid], minlength=vocab)
    want = np.where(valid, bc[np.where(valid, flat, 0)], 0).reshape(shape)
    np.testing.assert_array_equal(got, want)


def test_pick_multiplicity_all_empty():
    ids = jnp.full((4, 3), EMPTY_KEY, jnp.int32)
    got = np.asarray(jax.jit(pick_multiplicity)(ids))
    np.testing.assert_array_equal(got, np.zeros((4, 3), np.int32))


def test_compact_mask_positions_matches_argsort():
    """compact_mask_positions == stable argsort compaction, padded with n."""
    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu.ops.unique import compact_mask_positions

    rng = np.random.default_rng(0)
    for n, cap in ((1, 1), (7, 4), (256, 256), (1000, 300), (1000, 1000)):
        mask = rng.random(n) < 0.3
        want = np.argsort(~mask, kind="stable")[:cap]
        k = int(mask.sum())
        got = np.asarray(compact_mask_positions(jnp.asarray(mask), cap))
        lim = min(k, cap)
        np.testing.assert_array_equal(got[:lim], want[:lim])
        assert (got[lim:] == n).all()


def test_take_runs_matches_slices():
    """take_runs (covering-tile fetch + local lane select) == direct
    slicing, across caps that stay inside one tile, exactly fill tiles,
    and straddle tile boundaries."""
    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu.ops.tiled import pad_tile, take_runs

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 10_000, 5000).astype(np.int32)
    ap = jnp.asarray(pad_tile(arr))
    for cap in (1, 7, 127, 128, 129, 300):
        starts = rng.integers(0, 5000 - cap, 200).astype(np.int32)
        got = np.asarray(take_runs(ap, jnp.asarray(starts), cap))
        want = np.stack([arr[s:s + cap] for s in starts])
        np.testing.assert_array_equal(got, want)
