"""Parity tests for the stats-only Pallas kernel (interpret mode on CPU).

The kernel must reproduce, bit-for-bit, the statistics the host pipeline
computes from a full traceback: match_vector + block_aligned_stats
(reference cluster.py:144-168) and identity_from_moves
(reference consensus.py:129-145) over the alignment of ops/align.py.
"""

import math

import numpy as np
import pytest

from ngspeciesid_tpu.ops.align import (
    block_aligned_stats,
    identity_from_moves,
    match_vector,
    sg_align_numpy,
)
from ngspeciesid_tpu.ops.align_stats_pallas import (
    block_stats_pallas,
    identity_pallas,
    sg_stats_batch_pallas,
)


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


def oracle(a, b, gap_open, k, match_id):
    moves = sg_align_numpy(a, b, gap_open)
    mv = match_vector(moves, a, b)
    r1, r2 = block_aligned_stats(mv, k, match_id, a.size, b.size)
    ident = identity_from_moves(moves, a, b)
    return r1, r2, ident


class TestStatsKernelParity:
    def test_random_pairs(self, rng):
        pairs, opens, ks, mids = [], [], [], []
        for _ in range(16):
            pairs.append((rand_seq(rng, int(rng.integers(8, 90))),
                          rand_seq(rng, int(rng.integers(8, 90)))))
            opens.append(int(rng.choice([2, 3, 5])))
            ks.append(int(rng.integers(5, 21)))
            mids.append(int(rng.integers(1, ks[-1] + 1)))
        got = sg_stats_batch_pallas(pairs, opens, ks, mids, interpret=True)
        for i, (a, b) in enumerate(pairs):
            want = oracle(a, b, opens[i], ks[i], mids[i])
            assert got[i] == pytest.approx(want, abs=0.0), (i, got[i], want)

    def test_related_pairs(self, rng):
        # realistic case: mutated copies, the fallback's parameterization
        pairs, opens, ks, mids = [], [], [], []
        k = 13
        for _ in range(12):
            a = rand_seq(rng, int(rng.integers(60, 200)))
            b = mutate(rng, a, 0.12)
            if b.size < 5:
                b = rand_seq(rng, 20)
            pairs.append((a, b))
            ers = 0.06 + rng.random() * 0.1
            opens.append(2 if ers > 0.1 else 3)
            ks.append(k)
            mids.append(math.floor((1.0 - ers) * k))
        got = sg_stats_batch_pallas(pairs, opens, ks, mids, interpret=True)
        for i, (a, b) in enumerate(pairs):
            want = oracle(a, b, opens[i], ks[i], mids[i])
            assert got[i] == pytest.approx(want, abs=0.0), (i, got[i], want)

    def test_i16_variant_matches_i32(self, rng, monkeypatch):
        # k <= 14 routes to the int16 lane kernel (16 pairs per tile); it
        # must agree bit-for-bit with the int32 kernel on the same pairs
        import ngspeciesid_tpu.ops.align_stats_pallas as asp

        pairs, opens, ks, mids = [], [], [], []
        for _ in range(10):
            a = rand_seq(rng, int(rng.integers(40, 160)))
            pairs.append((a, mutate(rng, a, 0.1)))
            opens.append(int(rng.choice([2, 3, 5])))
            ks.append(13)
            mids.append(int(rng.integers(1, 14)))
        via_i16 = sg_stats_batch_pallas(pairs, opens, ks, mids,
                                        interpret=True)
        monkeypatch.setattr(asp, "I16_MAX_K", 0)   # force the int32 kernel
        via_i32 = sg_stats_batch_pallas(pairs, opens, ks, mids,
                                        interpret=True)
        assert via_i16 == via_i32
        for i, (a, b) in enumerate(pairs):
            assert via_i16[i] == pytest.approx(
                oracle(a, b, opens[i], ks[i], mids[i]), abs=0.0)

    def test_unpacked_high_k(self, rng):
        # k > PACK_MAX_K routes to the 6-field (unpacked) int32 layout;
        # parity must hold there too (the p-table reaches k=30)
        pairs, opens, ks, mids = [], [], [], []
        for _ in range(6):
            a = rand_seq(rng, int(rng.integers(60, 140)))
            pairs.append((a, mutate(rng, a, 0.08)))
            opens.append(3)
            ks.append(int(rng.choice([26, 28, 30])))
            mids.append(int(rng.integers(5, 20)))
        got = sg_stats_batch_pallas(pairs, opens, ks, mids, interpret=True)
        for i, (a, b) in enumerate(pairs):
            want = oracle(a, b, opens[i], ks[i], mids[i])
            assert got[i] == pytest.approx(want, abs=0.0)

    def test_terminal_gap_windows(self, rng):
        # long unaligned suffixes/prefixes: the host tail fold must count
        # windows that straddle the aligned core and trailing gap columns
        a = rand_seq(rng, 150)
        core = a[40:90].copy()
        b = np.concatenate([rand_seq(rng, 30), core, rand_seq(rng, 60)])
        pairs = [(a, b), (b, a)]
        opens, ks, mids = [3, 3], [13, 13], [11, 11]
        got = sg_stats_batch_pallas(pairs, opens, ks, mids, interpret=True)
        for i, (s1, s2) in enumerate(pairs):
            want = oracle(s1, s2, opens[i], ks[i], mids[i])
            assert got[i] == pytest.approx(want, abs=0.0)

    def test_negative_match_id(self, rng):
        # err_sum > 1 makes match_id <= 0: every window passes, including
        # all-gap windows in leading/trailing terminal gaps
        a = rand_seq(rng, 12)
        b = rand_seq(rng, 120)
        got = sg_stats_batch_pallas([(a, b)], [2], [13], [-3], interpret=True)
        want = oracle(a, b, 2, 13, -3)
        assert got[0] == pytest.approx(want, abs=0.0)

    def test_short_alignment_below_k(self, rng):
        # total columns < k: ratios are defined as 0 (cluster.py:146)
        a = rand_seq(rng, 5)
        b = rand_seq(rng, 6)
        got = sg_stats_batch_pallas([(a, b)], [5], [20], [10], interpret=True)
        want = oracle(a, b, 5, 20, 10)
        assert got[0] == pytest.approx(want, abs=0.0)
        assert got[0][0] == 0.0 and got[0][1] == 0.0

    def test_identity_wrapper(self, rng):
        pairs = [(rand_seq(rng, 80), rand_seq(rng, 70)) for _ in range(5)]
        got = identity_pallas(pairs, [3] * 5, interpret=True)
        for i, (a, b) in enumerate(pairs):
            moves = sg_align_numpy(a, b, 3)
            assert got[i] == pytest.approx(identity_from_moves(moves, a, b), abs=0.0)

    def test_block_stats_wrapper(self, rng):
        pairs = [(rand_seq(rng, 80), mutate(rng, rand_seq(rng, 80), 0.1))
                 for _ in range(4)]
        got = block_stats_pallas(pairs, [4] * 4, [13] * 4, [11] * 4,
                                 interpret=True)
        for i, (a, b) in enumerate(pairs):
            r1, r2, _ = oracle(a, b, 4, 13, 11)
            assert got[i] == pytest.approx((r1, r2), abs=0.0)


class TestBandedParity:
    """band > 0: the rolling-window kernel must equal the native banded
    engine whenever the optimal path stays inside the band (the production
    contract: same-template amplicon pairs, VERDICT r2 items 1/5).  Both
    then also equal the full DP."""

    def _pairs(self, rng, n_pairs=12, lo=300, hi=900, rate=0.12):
        pairs, opens, ks, mids = [], [], [], []
        for _ in range(n_pairs):
            a = rand_seq(rng, int(rng.integers(lo, hi)))
            b = mutate(rng, a, rate)
            pairs.append((a, b))
            opens.append(int(rng.choice([2, 3, 4, 5])))
            ks.append(int(rng.choice([13, 15, 20])))
            mids.append(int(rng.integers(5, 15)))
        return pairs, opens, ks, mids

    def test_banded_equals_full_and_native(self, rng):
        from ngspeciesid_tpu import native

        pairs, opens, ks, mids = self._pairs(rng)
        got = sg_stats_batch_pallas(pairs, opens, ks, mids, band=150,
                                    interpret=True)
        full = [oracle(a, b, o, k, m)
                for (a, b), o, k, m in zip(pairs, opens, ks, mids)]
        for g, w in zip(got, full):
            assert g == pytest.approx(w, abs=0)
        if native.available():
            nat = native.block_stats_native(pairs, opens, ks, mids, band=150)
            for g, w in zip(got, nat):
                assert (g[0], g[1]) == pytest.approx(w, abs=0)

    def test_banded_mixed_length_chunking(self, rng):
        # wide length spread in one request: the chunk planner must keep
        # every pair's band covered by its chunk's shared window
        pairs, opens, ks, mids = [], [], [], []
        for lo, hi in ((80, 150), (300, 500), (600, 1000)):
            p, o, kk, mm = self._pairs(rng, n_pairs=5, lo=lo, hi=hi)
            pairs += p; opens += o; ks += kk; mids += mm
        got = sg_stats_batch_pallas(pairs, opens, ks, mids, band=150,
                                    interpret=True)
        full = [oracle(a, b, o, k, m)
                for (a, b), o, k, m in zip(pairs, opens, ks, mids)]
        for g, w in zip(got, full):
            assert g == pytest.approx(w, abs=0)

    def test_window_schedule_covers_band(self, rng):
        from ngspeciesid_tpu.ops.align_stats_pallas import _window_schedule

        for _ in range(20):
            B = int(rng.integers(1, 9))
            len1 = rng.integers(50, 1200, size=B)
            len2 = rng.integers(50, 1200, size=B)
            n = int(len1.max()); m = int(len2.max())
            band = int(rng.choice([50, 150, 300]))
            base, W = _window_schedule(len1, len2, n, m, band)
            base = base[0]
            # slope and monotonicity invariants consumed by the kernel
            d = np.diff(base[: n + m + 1].astype(np.int64))
            assert (d >= 0).all() and (d <= 1).all()
            if W >= n + 1:
                continue
            # every interior in-band cell of every pair sits in the window
            for b in range(B):
                nb, mb = int(len1[b]), int(len2[b])
                i = np.arange(1, nb + 1, dtype=np.int64)[:, None]
                j = np.arange(1, mb + 1, dtype=np.int64)[None, :]
                inband = ((j - band) * nb <= i * mb) & \
                         (i * mb <= (j + band + 1) * nb - 1)
                ii, jj = np.nonzero(inband)
                iv, dv = ii + 1, ii + 1 + jj + 1
                lane = iv - base[dv]
                assert (lane >= 0).all() and (lane < W).all()


class TestDevicePool:
    def test_growth_boundary_keeps_offsets_valid(self, rng):
        # regression: the ladder-PADDED append chunk must fit capacity —
        # dynamic_update_slice clamps an out-of-range start, which would
        # land the chunk at a wrong offset and silently corrupt residency
        from ngspeciesid_tpu.ops.align_stats_pallas import DevicePool

        pool = DevicePool()
        pool.cap = 1 << 17          # 128 KB, so growth happens immediately
        rows = []
        for _ in range(40):
            rows.append(rng.integers(65, 69, size=int(
                rng.integers(20_000, 70_000))).astype(np.uint8))
            pool.ensure(rows[-1:])
        dev = np.asarray(pool.dev)
        for r in rows:
            off = pool.offset(r)
            assert np.array_equal(dev[off:off + r.size], r), \
                "resident bytes diverge from the host row"

    def test_wrap_reuploads_current_request(self, rng):
        from ngspeciesid_tpu.ops.align_stats_pallas import DevicePool

        pool = DevicePool()
        old_max = DevicePool.CAP_MAX
        DevicePool.CAP_MAX = 1 << 19    # 512 KB
        try:
            pool.cap = 1 << 17
            a = rng.integers(65, 69, size=100_000).astype(np.uint8)
            pool.ensure([a])
            # force a wrap with a request that includes the resident row
            b = rng.integers(65, 69, size=400_000).astype(np.uint8)
            pool.ensure([a, b])
            dev = np.asarray(pool.dev)
            for r in (a, b):
                off = pool.offset(r)
                assert np.array_equal(dev[off:off + r.size], r)
        finally:
            DevicePool.CAP_MAX = old_max
