"""Pallas wavefront kernel parity tests (interpret mode on CPU).

On real TPU hardware the same kernel compiles natively; bench.py and the
background TPU parity checks exercise that path.
"""

import numpy as np
import pytest

from ngspeciesid_tpu.ops.align import sg_align_batch
from ngspeciesid_tpu.ops.align_pallas import sg_align_batch_pallas


def rand_seq(rng, n):
    return rng.integers(65, 69, size=n).astype(np.uint8)


def mutate(rng, s, rate):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        out.append(int(c))
        if r < 2 * rate / 3:
            out.append(int(rng.integers(65, 69)))
    return np.array(out, dtype=np.uint8)


class TestPallasParity:
    def test_random_pairs(self, rng):
        pairs, opens = [], []
        for _ in range(10):
            pairs.append((rand_seq(rng, int(rng.integers(8, 90))),
                          rand_seq(rng, int(rng.integers(8, 90)))))
            opens.append(int(rng.choice([2, 3, 5])))
        got = sg_align_batch_pallas(pairs, opens, interpret=True)
        want = sg_align_batch(pairs, opens, backend="numpy")
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()

    def test_related_pairs(self, rng):
        # realistic case: mutated copies, long shared diagonals
        pairs, opens = [], []
        for _ in range(8):
            a = rand_seq(rng, int(rng.integers(40, 120)))
            b = mutate(rng, a, 0.15)
            if b.size < 5:
                b = rand_seq(rng, 20)
            pairs.append((a, b))
            opens.append(2)
        got = sg_align_batch_pallas(pairs, opens, interpret=True)
        want = sg_align_batch(pairs, opens, backend="numpy")
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()

    def test_asymmetric_lengths(self, rng):
        pairs = [(rand_seq(rng, 6), rand_seq(rng, 200)),
                 (rand_seq(rng, 200), rand_seq(rng, 6))]
        got = sg_align_batch_pallas(pairs, [5, 5], interpret=True)
        want = sg_align_batch(pairs, [5, 5], backend="numpy")
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()

    def test_batch_padding(self, rng):
        # non-multiple-of-8 batch exercises the sublane padding path
        pairs = [(rand_seq(rng, 30), rand_seq(rng, 33)) for _ in range(11)]
        got = sg_align_batch_pallas(pairs, [3] * 11, interpret=True)
        want = sg_align_batch(pairs, [3] * 11, backend="numpy")
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()


def test_device_pool_stale_reference_survives_growth(rng):
    """Growth/append must NOT donate the old device buffer: the prewarm
    thread grows the pool concurrently with launches, and a stale
    pool.dev captured for an in-flight launch must stay readable
    (regression: "Array has been deleted with shape=uint8[...]")."""
    import jax.numpy as jnp
    from ngspeciesid_tpu.ops.align_stats_pallas import DevicePool

    pool = DevicePool()
    rows = [rng.integers(65, 69, 300).astype(np.uint8) for _ in range(4)]
    pool.ensure(rows)
    old_dev, old_cap = pool.view()
    offs = [pool.offset(r) for r in rows]
    # concurrent-thread behavior, serialized: grow + append AFTER capture
    pool.reserve(pool.cap * 4 + 1)
    big = [rng.integers(65, 69, 70000).astype(np.uint8) for _ in range(3)]
    pool.ensure(big)
    assert pool.cap > old_cap
    # the stale buffer must still be alive and hold the original rows
    stale = np.asarray(old_dev)
    for r, o in zip(rows, offs):
        assert bytes(stale[o:o + r.size]) == r.tobytes()
    # and the new buffer serves both old and new rows
    fresh = np.asarray(pool.view()[0])
    for r in rows + big:
        o = pool.offset(r)
        assert bytes(fresh[o:o + r.size]) == r.tobytes()
