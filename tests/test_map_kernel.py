"""Parity tests: the batched masked-mAP kernel vs the NumPy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.map_kernel import build_pool, map_from_masks, dataset_map
from oracle import make_random_dataset, masked_map


def _compare(weak, strong, labels, wsel, ssel, lsel, atol=2e-5):
    pool = build_pool(weak, strong, labels)
    got = float(
        map_from_masks(
            pool, jnp.asarray(wsel), jnp.asarray(ssel), jnp.asarray(lsel)
        )
    )
    want = masked_map(weak, strong, labels, wsel, ssel, lsel)
    if np.isnan(want):
        assert np.isnan(got)
    else:
        assert got == pytest.approx(want, abs=atol)


@pytest.mark.parametrize("seed", range(8))
def test_full_dataset_map_fuzz(seed):
    rng = np.random.default_rng(seed)
    weak, strong, labels = make_random_dataset(rng)
    n = len(labels)
    ones = np.ones(n, bool)
    zeros = np.zeros(n, bool)
    _compare(weak, strong, labels, ones, zeros, ones)


@pytest.mark.parametrize("seed", range(8))
def test_random_subset_map_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    weak, strong, labels = make_random_dataset(rng, n_img=16)
    n = len(labels)
    wsel = rng.random(n) < 0.6
    ssel = rng.random(n) < 0.3
    lsel = wsel | ssel
    _compare(weak, strong, labels, wsel, ssel, lsel)


def test_mixed_offload_equals_oracle():
    rng = np.random.default_rng(7)
    weak, strong, labels = make_random_dataset(rng, n_img=10)
    n = len(labels)
    off = rng.random(n) < 0.5
    pool = build_pool(weak, strong, labels)
    got = float(dataset_map(pool, jnp.asarray(off)))
    want = masked_map(weak, strong, labels, ~off, off, np.ones(n, bool))
    assert got == pytest.approx(want, abs=2e-5)


def test_no_labels_gives_nan():
    rng = np.random.default_rng(3)
    weak, strong, _ = make_random_dataset(rng, n_img=4)
    labels = [np.zeros(0, int)] * 4
    ones = np.ones(4, bool)
    pool = build_pool(weak, strong, labels)
    got = float(map_from_masks(pool, jnp.asarray(ones), jnp.asarray(~ones), jnp.asarray(ones)))
    assert np.isnan(got)


def test_no_detections_gives_zero():
    labels = [np.array([0, 1]), np.array([2])]
    empty = [(np.zeros((0, 1), bool), np.array([]), np.array([])),
             (np.zeros((0, 1), bool), np.array([]), np.array([]))]
    pool = build_pool(empty, empty, labels)
    ones = jnp.ones(2, bool)
    got = float(map_from_masks(pool, ones, ~ones, ones))
    assert got == 0.0


def test_multi_threshold_axis():
    rng = np.random.default_rng(11)
    weak, strong, labels = make_random_dataset(rng, n_img=8, t=3)
    n = len(labels)
    ones = np.ones(n, bool)
    zeros = np.zeros(n, bool)
    _compare(weak, strong, labels, ones, zeros, ones)


def test_mm_variants_bit_exact():
    """The MXU-matmul knobs (MM_CUMSUM cumsums, MM_LM_ROWS mask gather) are
    BIT-exact vs the default paths: operands are 0/1 and every partial sum an
    integer, so bf16 operand rounding and summation order cannot bite."""
    from edgeml_tpu.ops import map_kernel as mk
    from edgeml_tpu.reward.orie import _orie_batch

    rng = np.random.default_rng(21)
    weak, strong, labels = make_random_dataset(rng, n_img=24)
    pool = build_pool(weak, strong, labels)
    n = len(labels)
    idx = jnp.arange(12, dtype=jnp.int32)
    key = jax.random.PRNGKey(5)

    def run():
        _orie_batch.clear_cache()  # flags are read at trace time
        rewards = _orie_batch(pool, idx, key, 8)
        in_ens = jnp.asarray(rng_fixed < 0.4) & (jnp.arange(n) != 3)
        pair = mk.orie_map_pair(pool, in_ens, jnp.asarray(3))
        return np.asarray(rewards), np.asarray(pair)

    rng_fixed = np.random.default_rng(77).random(n)
    saved = (mk.MM_LM_ROWS, mk.MM_CUMSUM)
    mk.MM_LM_ROWS = mk.MM_CUMSUM = False
    base_r, base_p = run()
    try:
        for rows, cs in ((True, False), (False, True), (True, True),
                         (False, "blocked"), (True, "blocked")):
            mk.MM_LM_ROWS, mk.MM_CUMSUM = rows, cs
            got_r, got_p = run()
            np.testing.assert_array_equal(got_r, base_r)
            np.testing.assert_array_equal(got_p, base_p)
    finally:
        # restore the PRODUCTION defaults, not False (an earlier version
        # left MM_CUMSUM=False for the rest of the test process)
        mk.MM_LM_ROWS, mk.MM_CUMSUM = saved
        _orie_batch.clear_cache()


def test_vmap_over_masks():
    rng = np.random.default_rng(13)
    weak, strong, labels = make_random_dataset(rng, n_img=10)
    n = len(labels)
    pool = build_pool(weak, strong, labels)
    masks = rng.random((6, n)) < 0.5
    batched = jax.vmap(lambda m: dataset_map(pool, m))(jnp.asarray(masks))
    for k in range(6):
        want = masked_map(
            weak, strong, labels, ~masks[k], masks[k], np.ones(n, bool)
        )
        assert float(batched[k]) == pytest.approx(want, abs=2e-5)


def _skew_class0(stream, rng, n=150):
    """Append n FP-only class-0 detections to stream[0] — makes class 0's
    pool row >128 so the bucket DP actually splits (it declines to split
    pools whose classes all fit one 128-lane tile). All-False tp is always
    matcher-consistent (pure false positives)."""
    tp0, conf0, cls0 = stream[0]
    t = tp0.shape[1] if tp0.size else 1
    stream[0] = (
        np.concatenate([tp0.reshape(-1, t), np.zeros((n, t), bool)]),
        np.concatenate([conf0, np.round(rng.random(n), 6)]),
        np.concatenate([cls0, np.zeros(n, np.int64)]),
    )


def test_bucketed_pool_matches_flat():
    """BucketedPool keeps every per-class AP identical (same rows, same
    order); the dataset mean only reassociates the per-class float sums, so
    mAP / per-threshold mAP / ORIE rewards match the flat pool to float
    tolerance. Also checks the partition itself: classes disjoint, complete,
    and every bucket's K covers its largest class."""
    from edgeml_tpu.ops import map_kernel as mk
    from edgeml_tpu.reward.orie import _orie_batch

    rng = np.random.default_rng(31)
    weak, strong, labels = make_random_dataset(rng, n_img=24)
    _skew_class0(weak, rng, n=150)  # heavy-tail so bucketing actually pays
    flat = build_pool(weak, strong, labels, buckets=1)
    buck = build_pool(weak, strong, labels, buckets=3)
    assert isinstance(buck, mk.BucketedPool)
    assert 2 <= len(buck.pools) <= 3
    # partition sanity
    all_ids = sorted(i for p in buck.pools for i in p.class_ids)
    assert all_ids == sorted(flat.class_ids)
    for p in buck.pools:
        counts = np.asarray(p.valid).sum(axis=1)
        assert p.tp.shape[1] % 128 == 0
        assert counts.max() <= p.tp.shape[1]
    assert buck.num_images == flat.num_images
    assert buck.num_iou_thresholds == flat.num_iou_thresholds

    n = len(labels)
    masks = rng.random((5, n)) < 0.5
    for k in range(5):
        a = float(dataset_map(flat, jnp.asarray(masks[k])))
        b = float(dataset_map(buck, jnp.asarray(masks[k])))
        assert b == pytest.approx(a, abs=2e-6)
    # per-threshold entry point
    m0 = jnp.asarray(masks[0])
    ones = jnp.ones((n,), bool)
    pt_a = np.asarray(mk.map_per_threshold(flat, ~m0, m0, ones))
    pt_b = np.asarray(mk.map_per_threshold(buck, ~m0, m0, ones))
    np.testing.assert_allclose(pt_b, pt_a, atol=2e-6)
    # ORIE rewards through the jitted batch
    idx = jnp.arange(12, dtype=jnp.int32)
    key = jax.random.PRNGKey(9)
    ra = np.asarray(_orie_batch(flat, idx, key, 8))
    rb = np.asarray(_orie_batch(buck, idx, key, 8))
    np.testing.assert_allclose(rb, ra, atol=3e-5)


def test_bucketed_pool_oracle_fuzz():
    """Bucketed mAP vs the independent NumPy oracle (same contract as the
    flat-pool fuzz tests)."""
    rng = np.random.default_rng(47)
    weak, strong, labels = make_random_dataset(rng, n_img=16)
    _skew_class0(weak, rng, n=140)
    pool = build_pool(weak, strong, labels, buckets=2)
    from edgeml_tpu.ops.map_kernel import BucketedPool

    assert isinstance(pool, BucketedPool)
    n = len(labels)
    for s in range(3):
        wsel = rng.random(n) < 0.6
        ssel = rng.random(n) < 0.4
        lsel = wsel | ssel
        got = float(
            map_from_masks(
                pool, jnp.asarray(wsel), jnp.asarray(ssel), jnp.asarray(lsel)
            )
        )
        want = masked_map(weak, strong, labels, wsel, ssel, lsel)
        assert got == pytest.approx(want, abs=2e-5)
