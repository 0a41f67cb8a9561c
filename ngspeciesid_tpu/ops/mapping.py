"""Approximate read-to-center mapping: minimizer anchors + colinear chain.

TPU-native replacement for the reference's minimap2 usage (N4 in SURVEY.md):
``minimap2 -x map-ont center reads > paf`` feeds racon with PAF-level
overlaps (reference consensus.py:121).  At amplicon scale a full mapper is
unnecessary — the polish DP aligns reads exactly — but the mapping layer
exists for (a) the racon driver's per-iteration PAF observability contract
and (b) anchor-bounded windowing at depths where full DP is wasteful.

Pipeline per read: windowed minimizers of read and center (the clustering
engine's exact-semantics extractor, ops/minimizers.py) in both strands ->
shared-code anchor join (vectorized searchsorted) -> best colinear chain
(dense DP over anchors with an affine gap-difference penalty, the standard
minimap2 chaining recurrence at small n) -> PAF record.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .minimizers import alphabet_ranks, batch_minimizers
from ..utils.seqs import reverse_complement_bytes

#: minimizer parameters for mapping (the clustering k/w operate on
#: hpol-compressed reads, mapping uses raw sequence).  Denser than
#: map-ont (k=13, 5 k-mers per window) for sensitivity at ONT error
#: rates without hpol compression; w follows the engine's reference
#: semantics (window = w - k + 1 k-mer starts).
MAP_K = 13
MAP_W = 17
#: chaining: max gap-length difference between consecutive anchors
MAX_GAP = 500
#: minimum anchors in an accepted chain
MIN_CHAIN = 4


@dataclasses.dataclass
class Mapping:
    """One PAF row (minus the query name, supplied by the caller)."""

    q_len: int
    q_start: int
    q_end: int
    strand: str          # '+' | '-'
    t_len: int
    t_start: int
    t_end: int
    n_match: int         # chained anchor count * k (residue matches proxy)
    block_len: int
    mapq: int

    def paf_fields(self, q_name: str, t_name: str) -> List[str]:
        return [q_name, str(self.q_len), str(self.q_start), str(self.q_end),
                self.strand, t_name, str(self.t_len), str(self.t_start),
                str(self.t_end), str(self.n_match), str(self.block_len),
                str(self.mapq)]


def _minimizers(seq: np.ndarray, k: int, w: int,
                rank_of: np.ndarray, rank_bits: int):
    codes, pos = batch_minimizers([seq], k, w, rank_of, rank_bits)[0]
    return codes, pos


def _anchors(q_codes, q_pos, t_sorted, t_sort_pos) -> Tuple[np.ndarray, np.ndarray]:
    """All (query_pos, target_pos) pairs with equal minimizer codes.
    t_sorted / t_sort_pos: the center's codes sorted ascending and the
    matching positions (precomputed once per center)."""
    if q_codes.size == 0 or t_sorted.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lo = np.searchsorted(t_sorted, q_codes, side="left")
    hi = np.searchsorted(t_sorted, q_codes, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    q_idx = np.repeat(np.arange(q_codes.size), counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    flat = np.repeat(lo, counts) + within
    return q_pos[q_idx], t_sort_pos[flat]


def _chain(qa: np.ndarray, ta: np.ndarray, k: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Best colinear chain over anchors (minimap2-style scoring at dense-DP
    scale): score = chained seed coverage minus a log-ish gap penalty;
    returns (q_positions, t_positions) of the winning chain in order."""
    n = qa.size
    if n == 0:
        return None
    order = np.lexsort((qa, ta))
    qa, ta = qa[order], ta[order]
    if n >= 2:
        dq = np.diff(qa)
        dt = np.diff(ta)
        if ((dq > 0).all() and (dt > 0).all()
                and (np.abs(dq - dt) <= MAX_GAP).all()):
            # clean colinear anchor set (the common case for real reads):
            # chain every anchor and skip the per-anchor python DP below.
            # This is a deliberate heuristic shortcut, not an equivalence:
            # the DP can still prefer dropping an anchor when consecutive
            # diagonal offsets cancel (e.g. +g then -g makes the skip-gap
            # 0 while per-pair penalties stay ~0.5*log2(g+1) each), so
            # n_match / mapq / chain endpoints may differ in such corner
            # cases.  Acceptable for this mapper's role (PAF observability
            # + polish windows, SURVEY.md N4 "only approximate mapping").
            if n < MIN_CHAIN:
                return None
            return qa, ta
    score = np.full(n, float(k))
    parent = np.full(n, -1, dtype=np.int64)
    for i in range(1, n):
        dq = qa[i] - qa[:i]
        dt = ta[i] - ta[:i]
        ok = (dq > 0) & (dt > 0) & (np.abs(dq - dt) <= MAX_GAP)
        if not ok.any():
            continue
        gain = np.minimum(np.minimum(dq, dt), k).astype(np.float64)
        gap = np.abs(dq - dt).astype(np.float64)
        cand = score[:i] + gain - 0.5 * np.log2(gap + 1.0)
        cand = np.where(ok, cand, -np.inf)
        j = int(np.argmax(cand))
        if cand[j] > score[i]:
            score[i] = cand[j]
            parent[i] = j
    best = int(np.argmax(score))
    chain = []
    while best >= 0:
        chain.append(best)
        best = int(parent[best])
    chain.reverse()
    idx = np.array(chain, dtype=np.int64)
    if idx.size < MIN_CHAIN:
        return None
    return qa[idx], ta[idx]


def _map_one(
    read_len: int, t_len: int, k: int,
    fwd_min, rev_min,
    t_sorted: np.ndarray, t_sort_pos: np.ndarray,
) -> Optional[Mapping]:
    """Best chain over both orientations given precomputed minimizers."""
    best: Optional[Tuple[int, str, np.ndarray, np.ndarray]] = None
    for strand, (q_codes, q_pos) in (("+", fwd_min), ("-", rev_min)):
        qa, ta = _anchors(q_codes, q_pos, t_sorted, t_sort_pos)
        chain = _chain(qa, ta, k)
        if chain is None:
            continue
        cq, ct = chain
        if best is None or cq.size > best[0]:
            best = (int(cq.size), strand, cq, ct)
    if best is None:
        return None
    n_anchor, strand, cq, ct = best
    q_start, q_end = int(cq[0]), int(cq[-1]) + k
    t_start, t_end = int(ct[0]), int(ct[-1]) + k
    if strand == "-":
        # PAF reports query coordinates on the original (+) strand
        q_start, q_end = read_len - q_end, read_len - q_start
    block = max(q_end - q_start, t_end - t_start)
    n_match = min(n_anchor * k, block)
    frac = n_match / block if block else 0.0
    mapq = int(min(60, 60 * frac * (n_anchor / (n_anchor + 10))))
    return Mapping(read_len, q_start, q_end, strand, t_len,
                   t_start, t_end, n_match, block, mapq)


def map_read(
    read: np.ndarray, center: np.ndarray,
    rank_of: np.ndarray, rank_bits: int,
    k: int = MAP_K, w: int = MAP_W,
) -> Optional[Mapping]:
    """Map one read against the center in both orientations; best chain wins."""
    t_codes, t_pos = _minimizers(center, k, w, rank_of, rank_bits)
    t_sort = np.argsort(t_codes, kind="stable")
    fwd = _minimizers(read, k, w, rank_of, rank_bits)
    rev = _minimizers(reverse_complement_bytes(read), k, w, rank_of, rank_bits)
    return _map_one(read.size, center.size, k, fwd, rev,
                    t_codes[t_sort], t_pos[t_sort])


def map_reads_to_center(
    center: np.ndarray, reads: Sequence[np.ndarray],
    k: int = MAP_K, w: int = MAP_W,
) -> List[Optional[Mapping]]:
    """Map every read: one center minimizer index, two batched minimizer
    passes (fw/rc), vectorized anchor joins, fast-path chaining."""
    if not reads:
        return []
    present = np.zeros(256, dtype=bool)
    present[center] = True
    for r in reads:
        present[r] = True
    rank_of, rank_bits = alphabet_ranks(np.flatnonzero(present).astype(np.uint8))
    t_codes, t_pos = _minimizers(center, k, w, rank_of, rank_bits)
    t_sort = np.argsort(t_codes, kind="stable")
    t_sorted, t_sort_pos = t_codes[t_sort], t_pos[t_sort]
    fwd = batch_minimizers(list(reads), k, w, rank_of, rank_bits)
    rev = batch_minimizers([reverse_complement_bytes(r) for r in reads],
                           k, w, rank_of, rank_bits)
    return [
        _map_one(r.size, center.size, k, fwd[i], rev[i], t_sorted, t_sort_pos)
        for i, r in enumerate(reads)
    ]


def write_paf(path: str, names: Sequence[str], mappings: Sequence[Optional[Mapping]],
              t_name: str) -> int:
    """Write PAF rows for mapped reads; returns the number written."""
    n = 0
    with open(path, "w") as f:
        for name, m in zip(names, mappings):
            if m is None:
                continue
            f.write("\t".join(m.paf_fields(name, t_name)) + "\n")
            n += 1
    return n
