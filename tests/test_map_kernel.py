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
