"""Stats-only Pallas TPU kernel: semi-global Gotoh DP with path statistics.

The consumers of the alignment kernel never need the alignment itself — only
two derived statistics of the optimal path (SURVEY.md N1):

  * cluster fallback: rolling-window aligned-region ratios
    (reference cluster.py:144-169), i.e. the number of k-column windows of
    the alignment with >= match_id matching columns, divided by each
    sequence length;
  * RC/dup detection: column identity = matches / alignment columns
    (reference consensus.py:129-145).

The move-matrix variant (ops/align_pallas.py) must ship an O(n*m) tensor to
the host for traceback.  This kernel removes that transfer entirely: because
every cell's move choice is a deterministic function of the cell (the same
tie-break the traceback uses — diag > up > left, gap-open on >=), the
statistics of the optimal path can be propagated FORWARD through the H/E/F
layers next to the scores.  Per layer and cell we carry six int32 fields:

    score | hist (last-k match bits) | wsum (matches in current window)
    wcount (windows with wsum >= match_id so far) | mcount (total matches)
    colcount (alignment columns so far, incl. leading terminal gaps)

Each DP transition consumes exactly one alignment column (match bit for
diagonal moves, 0 for gap columns), so the update is a shift-register step:
the bit leaving the window decrements wsum, the entering bit increments it.
Boundary cells restart a path with colcount = i + j leading terminal-gap
columns.  Trailing terminal gaps are applied on the host from the returned
(hist, wsum, ...) scalars — a closed-form popcount fold, no device data
beyond one 128-lane row per pair.

Semantics are bit-identical to match_vector + block_aligned_stats +
identity_from_moves over the traceback of ops/align.py (parity-tested in
tests/test_align_stats.py).  Requires k <= 30 (history bits in int32); the
pipeline's k is 13/15 (presets) and the p-table tops out at 30.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import NEG_INF

SUBLANES = 8
DIAGS_PER_STEP = 8
BEST_W = 128
N_FIELDS = 6  # score, hist, wsum, wcount, mcount, colcount

MAX_K = 30  # history bits must fit int32


def _push_column(stats, bit, kk, mid, mask_hist):
    """Advance a path-stat tuple by one alignment column with match `bit`."""
    s, h, ws, wc, mc, cc = stats
    exiting = jnp.right_shift(h, kk - 1) & 1
    h2 = ((h << 1) | bit) & mask_hist
    ws2 = ws - exiting + bit
    cc2 = cc + 1
    wc2 = wc + ((cc2 >= kk) & (ws2 >= mid)).astype(jnp.int32)
    mc2 = mc + bit
    return s, h2, ws2, wc2, mc2, cc2


def _select(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def _roll_up(stats, lanes, neg):
    """Shift every field to lane i from lane i-1 (lane 0 becomes invalid)."""
    out = []
    for fi, x in enumerate(stats):
        r = pltpu.roll(x, 1, 1)
        fill = neg if fi == 0 else jnp.int32(0)
        out.append(jnp.where(lanes == 0, fill, r))
    return tuple(out)


def _stats_kernel(meta_ref, s1_ref, s2r_ref,           # inputs (VMEM)
                  best_ref,                              # output (8, BEST_W)
                  Hd1, Hd2, Ee, Ff,                      # scratch (N_FIELDS, 8, L)
                  *, match: int, mismatch: int, gap_ext: int,
                  n: int, m: int, L: int):
    d = pl.program_id(1)
    NEG = jnp.int32(NEG_INF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, L), 1)
    len1 = meta_ref[:, 0][:, None]
    len2 = meta_ref[:, 1][:, None]
    gopen = meta_ref[:, 2][:, None]
    kk = meta_ref[:, 3][:, None]
    mid = meta_ref[:, 4][:, None]
    mask_hist = jnp.left_shift(jnp.int32(1), kk) - 1
    ext = jnp.int32(gap_ext)
    is_first = d == 0

    def read(ref, init_score):
        fields = []
        for fi in range(N_FIELDS):
            init = init_score if fi == 0 else jnp.zeros((SUBLANES, L), jnp.int32)
            fields.append(jnp.where(is_first, init, ref[fi]))
        return tuple(fields)

    neg_full = jnp.full((SUBLANES, L), NEG, jnp.int32)
    hd1 = read(Hd1, jnp.where(lanes == 0, 0, NEG))   # diagonal 0: only (0,0)
    hd2 = read(Hd2, neg_full)
    ee = read(Ee, neg_full)
    ff = read(Ff, neg_full)

    cidx = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, BEST_W), 1)
    best_init = jnp.where((cidx == 0) | (cidx == 8), NEG,
                          jnp.where((cidx == 1) | (cidx == 9), -1, 0))
    cur = jnp.where(is_first, best_init, best_ref[:, :])

    s1_shift = pltpu.roll(s1_ref[:, :], 1, 1)         # lane i -> s1[i-1]
    W = s2r_ref.shape[1]

    for ks in range(DIAGS_PER_STEP):
        dd = d * DIAGS_PER_STEP + ks + 1
        j_of = dd - lanes
        valid = (lanes <= len1) & (j_of >= 0) & (j_of <= len2)

        # ---- E layer: gap in s1 (LEFT column), same-lane predecessors
        e_open = hd1[0] - gopen
        e_ext = ee[0] - ext
        e_src = _select(e_open >= e_ext, hd1, ee)
        enew = _push_column(
            (jnp.maximum(e_open, e_ext),) + e_src[1:], jnp.int32(0),
            kk, mid, mask_hist)

        # ---- F layer: gap in s2 (UP column), lane i-1 predecessors
        hd1_up = _roll_up(hd1, lanes, NEG)
        ff_up = _roll_up(ff, lanes, NEG)
        f_open = hd1_up[0] - gopen
        f_ext = ff_up[0] - ext
        f_src = _select(f_open >= f_ext, hd1_up, ff_up)
        fnew = _push_column(
            (jnp.maximum(f_open, f_ext),) + f_src[1:], jnp.int32(0),
            kk, mid, mask_hist)

        # ---- diagonal candidate: H[dd-2] at lane i-1 + substitution column
        s2c = pltpu.roll(s2r_ref[:, :], W - (n + m - dd), 1)[:, :L]
        ismatch = (s1_shift == s2c).astype(jnp.int32)
        sub = jnp.where(ismatch == 1, jnp.int32(match), jnp.int32(mismatch))
        hd2_up = _roll_up(hd2, lanes, NEG)
        dnew = _push_column(
            (hd2_up[0] + sub,) + hd2_up[1:], ismatch, kk, mid, mask_hist)

        # ---- H choice (same tie-break as the traceback: diag > up > left)
        h_no_e = jnp.maximum(dnew[0], fnew[0])
        hnew = _select(enew[0] > h_no_e, enew,
                       _select(fnew[0] > dnew[0], fnew, dnew))
        hnew = (jnp.maximum(h_no_e, enew[0]),) + hnew[1:]

        # boundary cells restart a path: i + j leading terminal-gap columns
        is_boundary = (lanes == 0) | (j_of == 0)
        cc0 = lanes + j_of
        wc0 = jnp.where(mid <= 0, jnp.maximum(cc0 - kk + 1, 0), 0)
        zero = jnp.zeros((SUBLANES, L), jnp.int32)
        boundary = (zero, zero, zero, wc0, zero, cc0)
        hnew = _select(is_boundary, boundary, hnew)
        hnew = (jnp.where(valid, hnew[0], NEG),) + hnew[1:]

        # ---- endpoint running best (at most one last-row / last-col lane
        # per diagonal, so a masked max selects that lane's fields; `>=`
        # keeps the corner-most = later diagonal on score ties)
        def lane_pick(mask_row, x, fill):
            return jnp.max(jnp.where(mask_row, x, fill), axis=1)

        in_last_row = valid & (lanes == len1)
        in_last_col = valid & (j_of == len2)
        row_val = lane_pick(in_last_row, hnew[0], NEG)
        row_j = lane_pick(in_last_row, j_of, -1)
        col_val = lane_pick(in_last_col, hnew[0], NEG)
        col_i = lane_pick(in_last_col, lanes, -1)
        take_row = ((row_j >= 0) & (row_val >= cur[:, 0]))[:, None]
        take_col = ((col_i >= 0) & (col_val >= cur[:, 8]))[:, None]

        row_payload = [row_val, row_j] + [
            lane_pick(in_last_row, hnew[fi], -1) for fi in range(1, N_FIELDS)]
        col_payload = [col_val, col_i] + [
            lane_pick(in_last_col, hnew[fi], -1) for fi in range(1, N_FIELDS)]
        for c, v in enumerate(row_payload):
            cur = jnp.where((cidx == c) & take_row, v[:, None], cur)
        for c, v in enumerate(col_payload):
            cur = jnp.where((cidx == 8 + c) & take_col, v[:, None], cur)

        hd2 = hd1
        hd1 = hnew
        ee = enew
        ff = fnew

    for fi in range(N_FIELDS):
        Hd1[fi] = hd1[fi]
        Hd2[fi] = hd2[fi]
        Ee[fi] = ee[fi]
        Ff[fi] = ff[fi]
    best_ref[:, :] = cur


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "L", "match", "mismatch", "gap_ext", "interpret"))
def _pallas_stats(meta, s1b, s2r,
                  n: int, m: int, L: int,
                  match: int, mismatch: int, gap_ext: int,
                  interpret: bool = False):
    B = s1b.shape[0]
    n_tiles = B // SUBLANES
    D_chunks = -(-(n + m) // DIAGS_PER_STEP)
    kernel = functools.partial(
        _stats_kernel, match=match, mismatch=mismatch, gap_ext=gap_ext,
        n=n, m=m, L=L)
    (best,) = pl.pallas_call(
        kernel,
        grid=(n_tiles, D_chunks),
        in_specs=[
            pl.BlockSpec((SUBLANES, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, L), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, s2r.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_FIELDS, SUBLANES, L), jnp.int32),
            pltpu.VMEM((N_FIELDS, SUBLANES, L), jnp.int32),
            pltpu.VMEM((N_FIELDS, SUBLANES, L), jnp.int32),
            pltpu.VMEM((N_FIELDS, SUBLANES, L), jnp.int32),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, BEST_W), jnp.int32)],
        interpret=interpret,
    )(meta, s1b, s2r)
    return best


def _popcount(x: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit popcount (SWAR)."""
    x = x.astype(np.uint32)
    x = x - ((x >> 1) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> 2) & np.uint32(0x33333333))
    x = (x + (x >> 4)) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> 24).astype(np.int64)


def sg_stats_batch_pallas(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    gap_opens: Sequence[int],
    ks: Sequence[int],
    match_ids: Sequence[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    interpret: bool = False,
) -> List[Tuple[float, float, float]]:
    """Per pair ``(aligned_ratio_s1, aligned_ratio_s2, identity)`` where the
    ratios follow reference cluster.py:144-168 (k-window with >= match_id
    matches) and identity follows consensus.py:129-145 — both measured on
    exactly the alignment ops/align.py would trace back.

    Only one 128-int row per pair leaves the device.
    """
    if not pairs:
        return []
    assert all(1 <= k <= MAX_K for k in ks), f"stats kernel requires k <= {MAX_K}"
    # Fixed batch tile: chunking bounds the padded batch sizes to the
    # power-of-two ladder {8..256}, so a production run compiles each
    # (n, m) length bucket at most ~6 times total and every later batch
    # reuses a cached program regardless of its size.
    MAX_B = 256
    if len(pairs) > MAX_B:
        out: List[Tuple[float, float, float]] = []
        for s in range(0, len(pairs), MAX_B):
            out.extend(sg_stats_batch_pallas(
                pairs[s:s + MAX_B], gap_opens[s:s + MAX_B], ks[s:s + MAX_B],
                match_ids[s:s + MAX_B], match=match, mismatch=mismatch,
                gap_ext=gap_ext, interpret=interpret))
        return out
    # Coarse shape buckets: Mosaic compiles are expensive (minutes through
    # a remote tunnel), so bound the number of distinct compiled programs
    # the way sg_align_batch does for the move-matrix kernel.
    from .align import _bucket_width

    n = _bucket_width(max(a.size for a, _ in pairs))
    m = _bucket_width(max(b.size for _, b in pairs))
    L = -(-(n + 1) // 128) * 128
    B = len(pairs)
    Bp = -(-B // SUBLANES) * SUBLANES
    Bp = max(SUBLANES, 1 << (Bp - 1).bit_length())  # power-of-two batch pad
    s2r_w = -(-(n + m + L) // 128) * 128
    s1b = np.zeros((Bp, L), dtype=np.int32)
    s2r = np.full((Bp, s2r_w), -1, dtype=np.int32)
    meta = np.ones((Bp, BEST_W), dtype=np.int32)
    meta[:, 2] = 5
    meta[:, 3] = 13
    meta[:, 4] = 1
    for i, (a, b) in enumerate(pairs):
        s1b[i, : a.size] = a
        s2r[i, n + m - b.size : n + m] = b[::-1]
        meta[i, 0] = a.size
        meta[i, 1] = b.size
        meta[i, 2] = gap_opens[i]
        meta[i, 3] = ks[i]
        meta[i, 4] = match_ids[i]
    best = np.asarray(_pallas_stats(
        jnp.asarray(meta), jnp.asarray(s1b), jnp.asarray(s2r),
        n=n, m=m, L=L, match=match, mismatch=mismatch, gap_ext=gap_ext,
        interpret=interpret))[:B]

    len1 = np.array([a.size for a, _ in pairs], dtype=np.int64)
    len2 = np.array([b.size for _, b in pairs], dtype=np.int64)
    karr = np.asarray(ks, dtype=np.int64)
    midarr = np.asarray(match_ids, dtype=np.int64)

    use_row = best[:, 0] >= best[:, 8]
    side = np.where(use_row[:, None], best[:, 0:8], best[:, 8:16])
    end_i = np.where(use_row, len1, side[:, 1])
    end_j = np.where(use_row, side[:, 1], len2)
    hist = side[:, 2].astype(np.int64)
    wc = side[:, 4].astype(np.int64)
    mc = side[:, 5].astype(np.int64)
    cc = side[:, 6].astype(np.int64)

    # trailing terminal gaps: tail mismatch columns shift the window by t;
    # after t shifts the window holds the low (k - t) history bits.
    tail = (len1 - end_i) + (len2 - end_j)
    t_cap = int(min(tail.max(initial=0), karr.max(initial=0)))
    for t in range(1, t_cap + 1):
        active = (tail >= t) & (t <= karr)
        keep = np.maximum(karr - t, 0)
        ws_t = _popcount(hist & ((np.int64(1) << keep) - 1))
        hit = active & (cc + t >= karr) & (ws_t >= midarr)
        wc += hit.astype(np.int64)
    # columns shifted fully out of the window: wsum = 0
    extra = np.maximum(tail - karr, 0)
    wc += np.where(midarr <= 0, extra, 0)

    total = cc + tail
    ident = mc / np.maximum(total, 1)
    ok = total >= karr
    r1 = np.where(ok, wc / len1, 0.0)
    r2 = np.where(ok, wc / len2, 0.0)
    return [(float(r1[i]), float(r2[i]), float(ident[i])) for i in range(B)]


def block_stats_pallas(pairs, gap_opens, ks, match_ids, interpret=False):
    """(aligned_ratio, target_ratio) per pair — Pallas counterpart of
    native.block_stats_native."""
    out = sg_stats_batch_pallas(pairs, gap_opens, ks, match_ids,
                                interpret=interpret)
    return [(r1, r2) for r1, r2, _ in out]


def identity_pallas(pairs, gap_opens, match=2, mismatch=-2, gap_ext=1,
                    interpret=False):
    """Column identity per pair — Pallas counterpart of
    native.identity_native (consensus.py:129-145 alignment parameters)."""
    out = sg_stats_batch_pallas(
        pairs, gap_opens, [1] * len(pairs), [1] * len(pairs),
        match=match, mismatch=mismatch, gap_ext=gap_ext, interpret=interpret)
    return [ident for _, _, ident in out]
