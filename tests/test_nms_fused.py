"""Fused Pallas suppressor (interpret mode) vs the XLA fixpoint oracle.

On-device the kernel was verified bit-identical over adversarial workloads
(tools/exp_emit3.py, 0 mismatches incl. heavy-overlap long-chain cases);
this covers the kernel logic in the CPU suite via the Pallas interpreter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import MAX_WH, greedy_keep_mask
from edgeml_tpu.ops.nms_fused import greedy_keep_mask_fused


@pytest.mark.parametrize("seed,spread,ncls", [
    (0, 80.0, 1),     # heavy overlap, single class: long suppression chains
    (1, 300.0, 4),
    (2, 2000.0, 80),  # spread regime with class offsets
])
def test_fused_matches_xla_fixpoint(seed, spread, ncls):
    rng = np.random.default_rng(seed)
    b, k = 3, 256
    xy = rng.uniform(20, 20 + spread, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(30, 150, (b, k, 2)).astype(np.float32)
    scores = np.sort(rng.random((b, k)).astype(np.float32), axis=-1)[:, ::-1]
    scores[scores < 0.05] = 0.0  # gated-out tail
    cls = rng.integers(0, ncls, (b, k)).astype(np.float32)
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    off = jnp.asarray(boxes + cls[..., None] * MAX_WH)
    sc = jnp.asarray(np.ascontiguousarray(scores))

    ref = jax.vmap(lambda bb, ss: greedy_keep_mask(bb, ss, 0.6))(off, sc)
    got = greedy_keep_mask_fused(off, sc, 0.6, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
