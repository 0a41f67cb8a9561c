"""Move-stream Pallas kernel parity (interpret mode on CPU).

The kernel extracts optimal-path op streams on device; with band=0 the
streams must be bit-identical to ops/align.sg_align_batch, and with
band>0 to the native banded engine whenever the path stays in the band
(the polish-window production contract).  The device pileup path
(NGSID_PILEUP=pallas) feeds the shared accumulation walk, so polish
outputs are bit-identical too.
"""

import os

import numpy as np
import pytest

from ngspeciesid_tpu import native
from ngspeciesid_tpu.ops.align import sg_align_batch
from ngspeciesid_tpu.ops.align_moves_pallas import (
    sg_moves_batch_pallas,
    sg_moves_pool_pallas,
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


class TestMovesParity:
    def test_random_pairs_full_dp(self, rng):
        pairs, opens = [], []
        for i in range(16):
            a = rand_seq(rng, int(rng.integers(10, 220)))
            b = mutate(rng, a, 0.15) if i % 3 else \
                rand_seq(rng, int(rng.integers(10, 220)))
            pairs.append((a, b))
            opens.append(int(rng.choice([2, 3, 4, 5])))
        want = sg_align_batch(pairs, opens, backend="numpy")
        got = sg_moves_batch_pallas(pairs, opens, band=0, interpret=True)
        for g, w in zip(got, want):
            assert g is not None and g.tolist() == w.tolist()

    def test_poa_scoring_parameters(self, rng):
        # the pileup uses POA scoring (open 2, ext 1) — different tie
        # geometry than the clustering tiers
        pairs = []
        for _ in range(8):
            a = rand_seq(rng, int(rng.integers(50, 300)))
            pairs.append((a, mutate(rng, a, 0.1)))
        opens = [2] * len(pairs)
        want = sg_align_batch(pairs, opens, match=2, mismatch=-4,
                              gap_ext=1, backend="numpy")
        got = sg_moves_batch_pallas(pairs, opens, match=2, mismatch=-4,
                                    gap_ext=1, band=0, interpret=True)
        for g, w in zip(got, want):
            assert g is not None and g.tolist() == w.tolist()

    @pytest.mark.skipif(not native.available(), reason="no native engine")
    def test_banded_matches_native(self, rng):
        pairs, opens = [], []
        for _ in range(8):
            a = rand_seq(rng, int(rng.integers(200, 800)))
            pairs.append((a, mutate(rng, a, 0.12)))
            opens.append(int(rng.choice([2, 3, 4, 5])))
        nat = native.align_batch_native(pairs, opens, band=150)
        got = sg_moves_batch_pallas(pairs, opens, band=150, interpret=True)
        for g, w in zip(got, nat):
            assert g is not None and g.tolist() == w.tolist()

    def test_pool_rows_shared(self, rng):
        # one center vs many reads through the pool API (the pileup shape)
        center = rand_seq(rng, 300)
        reads = [mutate(rng, center, 0.1) for _ in range(6)]
        seqs = [center] + reads
        rows1 = [0] * 6
        rows2 = list(range(1, 7))
        got = sg_moves_pool_pallas(seqs, rows1, rows2, [2] * 6, band=150,
                                   interpret=True)
        want = sg_align_batch([(center, r) for r in reads], [2] * 6,
                              backend="numpy")
        for g, w in zip(got, want):
            assert g is not None and g.tolist() == w.tolist()


class TestPileupPallas:
    def test_pileup_stats_bit_identical(self, rng, monkeypatch):
        from ngspeciesid_tpu.ops import poa

        center = rand_seq(rng, 400)
        reads, quals = [], []
        for _ in range(12):
            r = mutate(rng, center, 0.08)
            reads.append(r)
            quals.append(rng.integers(45, 70, size=r.size).astype(np.uint8))

        monkeypatch.setenv("NGSID_PILEUP", "python")
        want = poa.pileup_stats(center, reads, quals)
        monkeypatch.setenv("NGSID_PILEUP", "pallas")
        # interpret-mode shim: the env-selected device path must run the
        # interpreted kernel on CPU test hosts
        orig = poa.sg_align_batch
        import ngspeciesid_tpu.ops.align_moves_pallas as amp
        real = amp.sg_moves_batch_pallas
        monkeypatch.setattr(
            amp, "sg_moves_batch_pallas",
            lambda *a, **kw: real(*a, **{**kw, "interpret": True}))
        got = poa.pileup_stats(center, reads, quals)
        assert got.votes.tolist() == want.votes.tolist()
        assert got.qvotes.tolist() == want.qvotes.tolist()
        assert got.coverage.tolist() == want.coverage.tolist()
        assert got.ins_votes == want.ins_votes
        assert got.ins_open.tolist() == want.ins_open.tolist()

    def test_polish_round_bit_identical(self, rng, monkeypatch):
        from ngspeciesid_tpu.ops import poa

        center = rand_seq(rng, 350)
        reads, quals = [], []
        for _ in range(20):
            r = mutate(rng, center, 0.1)
            reads.append(r)
            quals.append(rng.integers(45, 70, size=r.size).astype(np.uint8))
        draft = mutate(rng, center, 0.02)

        monkeypatch.setenv("NGSID_PILEUP", "")
        want = poa.polish_round(draft, reads, quals)
        monkeypatch.setenv("NGSID_PILEUP", "pallas")
        import ngspeciesid_tpu.ops.align_moves_pallas as amp
        real = amp.sg_moves_batch_pallas
        monkeypatch.setattr(
            amp, "sg_moves_batch_pallas",
            lambda *a, **kw: real(*a, **{**kw, "interpret": True}))
        got = poa.polish_round(draft, reads, quals)
        assert got.tolist() == want.tolist()
