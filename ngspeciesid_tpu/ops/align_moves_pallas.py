"""Move-stream Pallas TPU kernel: banded semi-global DP with ON-DEVICE
traceback, returning per-pair alignment op streams (SURVEY.md N1/N5/N6).

The polish pileup (ops/poa.pileup_stats / native sg_pileup_native) and the
draft-POA profile fold consume per-read *alignments*, not just path
statistics.  The earlier move-matrix kernel (ops/align_pallas.py) ships the
whole O(n*m) packed matrix to the host for traceback; this kernel keeps the
matrix in VMEM and extracts the optimal path on device, so only an
O(n+m)-byte op stream per pair crosses the host link.

Forward sweep: the banded rolling-window wavefront of
ops/align_stats_pallas.py (same window schedule, same tie-breaks:
diag > up > left, gap-open on >=), carrying scores only and storing one
packed move byte per in-band cell in VMEM scratch:

    bits 0-1  chosen H layer (1 = DIAG, 2 = UP, 3 = LEFT)
    bit  2    E chain opens here (e_open >= e_ext)
    bit  3    F chain opens here (f_open >= f_ext)

Backward pass (last grid step, still on device): instead of a sequential
pointer walk, the path is extracted as a vectorized mask propagation over
diagonals in reverse.  Three lane masks (onH / onE / onF — the traceback's
H/E/F automaton states) mark the path cell on each diagonal; per diagonal
the masks fold (H->E / H->F happen on the same cell), the emitted op is
reduced across lanes into ``ops[:, d]`` (the path crosses each
anti-diagonal at most once, so diagonal order IS path order), and the masks
roll to the predecessor frames exactly like the forward shifts, transposed.
Cost per diagonal matches the forward sweep — no scalar chasing.

Host reconstruction appends the terminal-gap runs from the endpoint /
start coordinates, reproducing ops/align.traceback_moves' full-span
layout: LEFT^j0 UP^i0 <core> LEFT^(m-j_end) UP^(n-i_end).

Parity: with band=0 the result is bit-identical to
ops/align.sg_align_batch (numpy/native backends); with band>0 it matches
the native banded engine whenever the optimal path stays inside the band
(the polish-window production contract; see the band-edge note in
align_stats_pallas.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import DIAG, LEFT, NEG_INF, UP
from .align_stats_pallas import (
    BEST_W,
    SUBLANES,
    _window_schedule,
)

DIAGS_PER_STEP = 8

#: VMEM budget for the per-tile packed move store (D x 8 x W uint8).
_MOVES_VMEM_CAP = 12 << 20


def _shift1(x, shift, lanes, W, fill):
    # negative dynamic roll shifts miscompile on multi-tile widths
    # (align_stats_pallas._shift_lanes); normalize to [0, W)
    src = lanes - shift
    bad = (src < 0) | (src >= W)
    rshift = jnp.where(shift < 0, shift + W, shift)
    return jnp.where(bad, fill, pltpu.roll(x, rshift, 1))


def _moves_kernel(base_ref,                              # SMEM (1, Dpad)
                  meta_ref, s1_ref, s2r_ref,             # inputs (VMEM)
                  best_ref, ops_ref,                     # outputs
                  Hd1, Hd2, Ee, Ff, Trk, Mv, BestS, OpsS,  # scratch
                  *, match: int, mismatch: int, gap_ext: int,
                  n: int, m: int, W: int, band: int, n_steps: int,
                  dpad: int):
    d = pl.program_id(1)
    NEG = jnp.int32(NEG_INF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, W), 1)
    len1 = meta_ref[:, 0][:, None]
    len2 = meta_ref[:, 1][:, None]
    gopen = meta_ref[:, 2][:, None]
    ext = jnp.int32(gap_ext)
    is_first = d == 0

    def read(ref, init):
        return jnp.where(is_first, init, ref[:, :])

    neg_full = jnp.full((SUBLANES, W), NEG, jnp.int32)
    hd1 = read(Hd1, jnp.where(lanes == 0, 0, NEG))
    hd2 = read(Hd2, neg_full)
    ee = read(Ee, neg_full)
    ff = read(Ff, neg_full)
    # tracker rows: 0 row-score 1 row-j 2 row-d | 3 col-score 4 col-i 5 col-d
    trk = [read(Trk[fi], neg_full if fi in (0, 3)
                else jnp.full((SUBLANES, W), -1, jnp.int32))
           for fi in range(6)]

    for ks in range(DIAGS_PER_STEP):
        dd = d * DIAGS_PER_STEP + ks + 1
        base = base_ref[0, dd]
        d1 = base - base_ref[0, dd - 1]
        d2 = base - base_ref[0, jnp.maximum(dd - 2, 0)]
        iv = base + lanes
        jv = dd - iv
        interior = (iv >= 1) & (iv <= len1) & (jv >= 1) & (jv <= len2)
        if band > 0:
            in_band = (((jv - band) * len1) <= (iv * len2)) & \
                      ((iv * len2) <= ((jv + band + 1) * len1 - 1))
            interior = interior & in_band
        is_boundary = ((iv == 0) & (jv >= 0) & (jv <= len2)) | \
                      ((jv == 0) & (iv <= len1))
        valid = interior | is_boundary

        e_open = _shift1(hd1, -d1, lanes, W, NEG) - gopen
        e_ext = _shift1(ee, -d1, lanes, W, NEG) - ext
        eopen_bit = (e_open >= e_ext).astype(jnp.int32)
        enew = jnp.maximum(e_open, e_ext)

        f_open = _shift1(hd1, 1 - d1, lanes, W, NEG) - gopen
        f_ext = _shift1(ff, 1 - d1, lanes, W, NEG) - ext
        fopen_bit = (f_open >= f_ext).astype(jnp.int32)
        fnew = jnp.maximum(f_open, f_ext)

        # shifts mod width: dynamic negative shifts miscompile multi-tile
        s1c = pltpu.roll(s1_ref[:, :],
                         (1 - base) % s1_ref.shape[1], 1)[:, :W]
        s2c = pltpu.roll(s2r_ref[:, :],
                         ((dd - base) - (n + m)) % s2r_ref.shape[1],
                         1)[:, :W]
        ismatch = (s1c == s2c) & (iv >= 1) & (iv <= len1) & \
            (jv >= 1) & (jv <= len2)
        sub = jnp.where(ismatch, jnp.int32(match), jnp.int32(mismatch))
        dnew = _shift1(hd2, 1 - d2, lanes, W, NEG) + sub

        h_no_e = jnp.maximum(dnew, fnew)
        hnew = jnp.maximum(h_no_e, enew)
        layer = jnp.where(enew > h_no_e, jnp.int32(LEFT),
                          jnp.where(fnew > dnew, jnp.int32(UP),
                                    jnp.int32(DIAG)))
        hnew = jnp.where(is_boundary, 0, hnew)
        hnew = jnp.where(valid, hnew, NEG)

        Mv[dd] = (layer | (eopen_bit << 2) | (fopen_bit << 3)).astype(jnp.uint8)

        ddv = jnp.full((SUBLANES, W), dd, jnp.int32)
        for off, mask_row, coord in ((0, valid & (iv == len1), jv),
                                     (3, valid & (jv == len2), iv)):
            take = mask_row & (hnew >= trk[off])
            for fi, v in ((off, hnew), (off + 1, coord), (off + 2, ddv)):
                trk[fi] = jnp.where(take, v, trk[fi])

        hd2 = hd1
        hd1 = hnew
        ee = enew
        ff = fnew

    Hd1[:, :] = hd1
    Hd2[:, :] = hd2
    Ee[:, :] = ee
    Ff[:, :] = ff
    for fi in range(6):
        Trk[fi] = trk[fi]

    @pl.when(d == n_steps - 1)
    def _finalize():
        # ---- endpoint pick (same semantics as align._best_end: corner-most
        # = latest diagonal on score ties; row side wins over col on ties)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, BEST_W), 1)
        out = jnp.zeros((SUBLANES, BEST_W), jnp.int32)
        picked = []
        for off in (0, 3):
            smax = jnp.max(trk[off], axis=1)[:, None]
            at_max = trk[off] == smax
            dmax = jnp.max(jnp.where(at_max, trk[off + 2], -1), axis=1)[:, None]
            pick = at_max & (trk[off + 2] == dmax)
            vals = []
            for c in range(3):
                v = jnp.max(jnp.where(pick, trk[off + c],
                                      NEG if c == 0 else -1), axis=1)
                out = jnp.where(cidx == (0 if off == 0 else 8) + c,
                                v[:, None], out)
                vals.append(v)
            picked.append(vals)
        (rs, rj, rd), (cs, ci_, cd) = picked
        use_row = rs >= cs
        end_i = jnp.where(use_row, meta_ref[:, 0], ci_)
        end_j = jnp.where(use_row, rj, meta_ref[:, 1])
        d_end = end_i + end_j
        found = jnp.where(use_row, rs, cs) > NEG

        # ---- backward path extraction: masks over lanes per diagonal.
        # Carry: p1* = accumulated masks for the NEXT (d-1) diagonal,
        # p2H = accumulated diag-move contributions for d-2.
        lanesW = lanes
        zero = jnp.zeros((SUBLANES, W), jnp.int32)
        dcol = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, dpad), 1)
        ops_acc0 = jnp.zeros((SUBLANES, dpad), jnp.int32)
        Dtot = n_steps * DIAGS_PER_STEP

        def body(t, carry):
            p1H, p1E, p1F, p2H, ops_acc = carry
            dd = Dtot - t
            base = base_ref[0, jnp.minimum(dd, dpad - 1)]
            b1 = base_ref[0, jnp.maximum(dd - 1, 0)]
            b2 = base_ref[0, jnp.maximum(dd - 2, 0)]
            d1 = base - b1
            d2 = base - b2
            iv = base + lanesW
            jv = dd - iv
            interior = ((iv >= 1) & (iv <= len1) & (jv >= 1)
                        & (jv <= len2)).astype(jnp.int32)
            seed = ((d_end[:, None] == dd) & found[:, None]
                    & (lanesW == (end_i[:, None] - base))).astype(jnp.int32)
            onH = (p1H | seed) * interior
            onE = p1E * interior
            onF = p1F * interior
            mv = Mv[dd].astype(jnp.int32)
            layer = mv & 3
            onE = onE | (onH * (layer == LEFT).astype(jnp.int32))
            onF = onF | (onH * (layer == UP).astype(jnp.int32))
            diag_e = onH * (layer == DIAG).astype(jnp.int32)
            opv = jnp.max(diag_e * DIAG + onF * UP + onE * LEFT, axis=1)
            ops_acc = jnp.where(dcol == dd, opv[:, None], ops_acc)
            eo = (mv >> 2) & 1
            fo = (mv >> 3) & 1
            # predecessor frames (transpose of the forward shifts)
            c1H = _shift1(onF * fo, d1 - 1, lanesW, W, 0) \
                | _shift1(onE * eo, d1, lanesW, W, 0)
            c1F = _shift1(onF * (1 - fo), d1 - 1, lanesW, W, 0)
            c1E = _shift1(onE * (1 - eo), d1, lanesW, W, 0)
            c2H = _shift1(diag_e, d2 - 1, lanesW, W, 0)
            return (p2H | c1H, c1E, c1F, c2H, ops_acc)

        carry = jax.lax.fori_loop(
            0, Dtot, body, (zero, zero, zero, zero, ops_acc0))
        OpsS[:, :] = carry[-1].astype(jnp.uint8)
        BestS[:, :] = out

    # outputs must be written on every grid step (double-buffered blocks;
    # see align_stats_pallas._stats_kernel)
    ops_ref[:, :] = OpsS[:, :]
    best_ref[:, :] = jnp.where(d == n_steps - 1, BestS[:, :], 0)


@functools.partial(
    jax.jit,
    static_argnames=("PB", "Bp", "L1", "s2rw", "dpad",
                     "n", "m", "W", "band", "match", "mismatch", "gap_ext",
                     "interpret"))
def _pallas_moves(blob,
                  PB: int, Bp: int, L1: int, s2rw: int, dpad: int,
                  n: int, m: int, W: int, band: int,
                  match: int, mismatch: int, gap_ext: int,
                  interpret: bool = False):
    from .align_stats_pallas import _le_i32

    o1 = PB + Bp * 32
    o2 = o1 + dpad * 4
    pool = blob[:PB]
    # endian-explicit reassembly; see align_stats_pallas._le_i32
    pm = _le_i32(blob[PB:o1].reshape(Bp, 8, 4))
    base = _le_i32(blob[o1:o2].reshape(1, dpad, 4))
    len1 = pm[:, 0]
    len2 = pm[:, 1]
    off1 = pm[:, 5]
    off2 = pm[:, 6]
    l1i = jnp.arange(L1, dtype=jnp.int32)[None, :]
    s1b = jnp.where(
        l1i < len1[:, None],
        jnp.take(pool, jnp.clip(off1[:, None] + l1i, 0, PB - 1),
                 mode="clip").astype(jnp.int32), 0)
    xi = jnp.arange(s2rw, dtype=jnp.int32)[None, :]
    srcj = (n + m - 1) - xi
    ok2 = (srcj >= 0) & (srcj < len2[:, None])
    s2r = jnp.where(
        ok2,
        jnp.take(pool, jnp.clip(off2[:, None] + srcj, 0, PB - 1),
                 mode="clip").astype(jnp.int32), -1)
    meta = jnp.pad(pm, ((0, 0), (0, BEST_W - 8)))
    n_tiles = Bp // SUBLANES
    n_steps = -(-(n + m) // DIAGS_PER_STEP)
    DM = n_steps * DIAGS_PER_STEP + 1
    kernel = functools.partial(
        _moves_kernel, match=match, mismatch=mismatch, gap_ext=gap_ext,
        n=n, m=m, W=W, band=band, n_steps=n_steps, dpad=dpad)
    best, ops = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_steps),
        in_specs=[
            pl.BlockSpec((1, dpad), lambda b, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBLANES, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, L1), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, s2rw), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, dpad), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, W), jnp.int32),
            pltpu.VMEM((SUBLANES, W), jnp.int32),
            pltpu.VMEM((SUBLANES, W), jnp.int32),
            pltpu.VMEM((SUBLANES, W), jnp.int32),
            pltpu.VMEM((6, SUBLANES, W), jnp.int32),
            pltpu.VMEM((DM, SUBLANES, W), jnp.uint8),
            pltpu.VMEM((SUBLANES, BEST_W), jnp.int32),
            pltpu.VMEM((SUBLANES, dpad), jnp.uint8),
        ],
        out_shape=[jax.ShapeDtypeStruct((Bp, BEST_W), jnp.int32),
                   jax.ShapeDtypeStruct((Bp, dpad), jnp.uint8)],
        interpret=interpret,
    )(base, meta, s1b, s2r)
    return best, ops


def sg_moves_pool_pallas(
    seqs: Sequence[np.ndarray],
    rows1: Sequence[int],
    rows2: Sequence[int],
    gap_opens: Sequence[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    band: int = 0,
    interpret: bool = False,
) -> List[Optional[np.ndarray]]:
    """Per pair: full-span move array (terminal gaps included), identical in
    layout to ops/align.sg_align_batch.  Returns None for a pair whose
    (bucketed) move store exceeds the VMEM cap — the caller falls back."""
    n_pairs = len(rows1)
    if n_pairs == 0:
        return []
    chunks = _plan(seqs, rows1, rows2)
    futures = []
    for sl in chunks:
        futures.append(_launch(
            seqs, [rows1[i] for i in sl], [rows2[i] for i in sl],
            [gap_opens[i] for i in sl],
            match, mismatch, gap_ext, band, interpret))
    gathered = jax.device_get(
        [(f[0], f[1]) for f in futures if f is not None])
    out: List[Optional[np.ndarray]] = [None] * n_pairs
    gi = 0
    for sl, fut in zip(chunks, futures):
        if fut is None:
            continue
        best, ops = gathered[gi]
        gi += 1
        _, _, len1, len2 = fut
        res = _reconstruct(np.asarray(best), np.asarray(ops), len1, len2)
        for i, r in zip(sl, res):
            out[i] = r
    return out


def _plan(seqs, rows1, rows2) -> List[List[int]]:
    from .align import _bucket_width

    order = sorted(
        range(len(rows1)),
        key=lambda i: (_bucket_width(seqs[rows1[i]].size),
                       _bucket_width(seqs[rows2[i]].size)))
    chunks: List[List[int]] = []
    cur: List[int] = []
    cur_key = None
    for i in order:
        key = (_bucket_width(seqs[rows1[i]].size),
               _bucket_width(seqs[rows2[i]].size))
        if cur and (key != cur_key or len(cur) >= 512):
            chunks.append(cur)
            cur = []
        cur_key = key
        cur.append(i)
    if cur:
        chunks.append(cur)
    return chunks


def _launch(seqs, r1, r2, gap_opens, match, mismatch, gap_ext, band,
            interpret):
    from .align import _bucket_width

    B = len(r1)
    len1 = np.fromiter((seqs[r].size for r in r1), np.int64, count=B)
    len2 = np.fromiter((seqs[r].size for r in r2), np.int64, count=B)
    n = _bucket_width(int(len1.max()))
    m = _bucket_width(int(len2.max()))
    L1 = -(-(n + 1) // 128) * 128
    s2rw = -(-(n + m + 1) // 128) * 128
    Bp = -(-B // SUBLANES) * SUBLANES
    Bp = max(SUBLANES if interpret else 128, 1 << (Bp - 1).bit_length())
    base, W = _window_schedule(len1, len2, n, m, band)
    dpad = base.shape[1]
    if dpad * SUBLANES * W > _MOVES_VMEM_CAP:
        return None
    offs: dict = {}
    parts: List[np.ndarray] = []
    off = 0
    for r in list(r1) + list(r2):
        if r not in offs:
            offs[r] = off
            parts.append(seqs[r])
            off += seqs[r].size
    pool = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    PB = 4096 if interpret else (1 << 18)
    while PB < pool.size:
        PB *= 2
    pool = np.pad(pool, (0, PB - pool.size))
    pm = np.ones((Bp, 8), np.int32)
    pm[:, 2] = 5
    pm[:, 5:] = 0
    pm[:B, 0] = len1
    pm[:B, 1] = len2
    pm[:B, 2] = np.asarray(gap_opens, np.int32)
    pm[:B, 5] = np.fromiter((offs[r] for r in r1), np.int64, count=B)
    pm[:B, 6] = np.fromiter((offs[r] for r in r2), np.int64, count=B)
    blob = np.concatenate([
        pool, pm.view(np.uint8).reshape(-1), base.view(np.uint8).reshape(-1)])
    best, ops = _pallas_moves(
        jnp.asarray(blob),
        PB=PB, Bp=Bp, L1=L1, s2rw=s2rw, dpad=dpad,
        n=n, m=m, W=W, band=band,
        match=match, mismatch=mismatch, gap_ext=gap_ext,
        interpret=interpret)
    return best, ops, len1, len2


def _reconstruct(best, ops, len1, len2) -> List[np.ndarray]:
    out = []
    for b in range(len1.size):
        n_b, m_b = int(len1[b]), int(len2[b])
        use_row = best[b, 0] >= best[b, 8]
        if best[b, 0] <= NEG_INF // 2 and best[b, 8] <= NEG_INF // 2:
            # no reachable endpoint (empty band): all-gap alignment
            out.append(np.concatenate([
                np.full(m_b, LEFT, np.uint8), np.full(n_b, UP, np.uint8)]))
            continue
        end_i = n_b if use_row else int(best[b, 9])
        end_j = int(best[b, 1]) if use_row else m_b
        core = ops[b][ops[b] != 0].astype(np.uint8)
        nd = int((core == DIAG).sum())
        nu = int((core == UP).sum())
        nl = int((core == LEFT).sum())
        i0 = end_i - nd - nu
        j0 = end_j - nd - nl
        out.append(np.concatenate([
            np.full(j0, LEFT, np.uint8), np.full(i0, UP, np.uint8), core,
            np.full(m_b - end_j, LEFT, np.uint8),
            np.full(n_b - end_i, UP, np.uint8)]))
    return out


def sg_moves_batch_pallas(pairs, gap_opens, match=2, mismatch=-2, gap_ext=1,
                          band=0, interpret=False):
    """Pairs-of-arrays wrapper over :func:`sg_moves_pool_pallas`."""
    seqs: List[np.ndarray] = []
    row_of: dict = {}
    rows1, rows2 = [], []
    for a, b in pairs:
        for arr, rows in ((a, rows1), (b, rows2)):
            key = id(arr)
            r = row_of.get(key)
            if r is None:
                r = len(seqs)
                row_of[key] = r
                seqs.append(arr)
            rows.append(r)
    return sg_moves_pool_pallas(seqs, rows1, rows2, gap_opens,
                                match=match, mismatch=mismatch,
                                gap_ext=gap_ext, band=band,
                                interpret=interpret)
