"""Native C++ DP engine parity and performance sanity."""

import numpy as np
import pytest

from ngspeciesid_tpu import native
from ngspeciesid_tpu.ops.align import sg_align_batch

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain for the native engine")


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


class TestNativeParity:
    def test_random_pairs(self, rng):
        pairs, opens = [], []
        for _ in range(50):
            pairs.append((rand_seq(rng, int(rng.integers(5, 200))),
                          rand_seq(rng, int(rng.integers(5, 200)))))
            opens.append(int(rng.choice([2, 3, 4, 5])))
        got = native.align_batch_native(pairs, opens)
        want = sg_align_batch(pairs, opens, backend="numpy")
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()

    def test_related_pairs(self, rng):
        pairs, opens = [], []
        for _ in range(20):
            a = rand_seq(rng, int(rng.integers(50, 400)))
            b = mutate(rng, a, 0.12)
            pairs.append((a, b))
            opens.append(2)
        got = native.align_batch_native(pairs, opens)
        want = sg_align_batch(pairs, opens, backend="numpy")
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()

    def test_auto_backend_uses_native(self, rng):
        pairs = [(rand_seq(rng, 40), rand_seq(rng, 44))]
        got = sg_align_batch(pairs, [3])          # auto -> native on host
        want = sg_align_batch(pairs, [3], backend="numpy")
        assert got[0].tolist() == want[0].tolist()
