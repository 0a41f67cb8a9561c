"""Pallas TPU kernel: batched semi-global Gotoh DP, anti-diagonal wavefront.

The device-native replacement for the scan DP in ops/align.py.  Eight pairs
ride the sublanes; the anti-diagonal rides the lanes, so every grid step
computes one full wavefront for eight alignments with pure VPU elementwise
ops + single-lane shifts:

    cell (i, j), diagonal dd = i + j, lane index = i:
      E[dd][i] = max(H[dd-1][i]   - open, E[dd-1][i]   - ext)   # from (i, j-1)
      F[dd][i] = max(H[dd-1][i-1] - open, F[dd-1][i-1] - ext)   # from (i-1, j)
      H[dd][i] = max(H[dd-2][i-1] + sub(s1[i-1], s2[dd-i-1]), E, F)

s2 is pre-reversed and pre-padded on the host so the per-diagonal character
vector is one dynamic lane-slice (no gather).  Wavefront state (four
diagonal vectors) lives in VMEM scratch across the sequential grid; the only
large output is the per-cell move word, written in DIAGONAL layout
(B, D, L) so every store is contiguous.  Endpoint selection (max over last
row/col with the corner-most tie-break of ops/align.py) is folded into the
sweep as a running masked max — only a few scalars per pair leave the chip
besides the moves.

Move semantics, tie-breaking, and the packed bit layout match
ops/align.py exactly (parity-tested in tests/test_align_pallas.py).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import DIAG, LEFT, NEG_INF, UP

SUBLANES = 8         # pairs per grid row
DIAGS_PER_STEP = 8   # anti-diagonals per grid step (output sublane tile)
BEST_W = 128         # width of the per-pair endpoint-best output row


def _kernel(meta_ref,                              # VMEM (8, 128): len1, len2, open
            s1_ref, s2r_ref,                          # VMEM inputs
            moves_ref,                                # VMEM out block (8, 1, L)
            best_ref,                                 # VMEM out block (8, 128)
            H1, H2, E, F,                             # VMEM scratch (8, L)
            *, match: int, mismatch: int, gap_ext: int,
            n: int, m: int, L: int):
    d = pl.program_id(1)
    NEG = jnp.int32(NEG_INF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, L), 1)  # i
    len1 = meta_ref[:, 0][:, None]                                 # (8, 1)
    len2 = meta_ref[:, 1][:, None]
    gopen = meta_ref[:, 2][:, None]

    @pl.when(d == 0)
    def _():
        H1[:] = jnp.where(lanes == 0, 0, NEG)   # seed: H[0, 0] = 0
        H2[:] = jnp.full((SUBLANES, L), NEG, jnp.int32)
        E[:] = jnp.full((SUBLANES, L), NEG, jnp.int32)
        F[:] = jnp.full((SUBLANES, L), NEG, jnp.int32)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, BEST_W), 1)
        best_ref[:, :] = jnp.where((cidx == 0) | (cidx == 2), NEG, 0)

    ext = jnp.int32(gap_ext)
    s1_shift = pltpu.roll(s1_ref[:, :], 1, 1)           # lane i -> s1[i-1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, BEST_W), 1)

    # DIAGS_PER_STEP diagonals per grid step: satisfies the (8, 128) output
    # tile constraint and amortizes per-step overhead.
    for k in range(DIAGS_PER_STEP):
        dd = d * DIAGS_PER_STEP + k + 1  # diagonal computed this sub-step
        j_of = dd - lanes
        valid = (lanes <= len1) & (j_of >= 0) & (j_of <= len2)

        Hp = H1[:]            # diagonal dd-1 at lane i
        Hpp = H2[:]           # diagonal dd-2

        e_open = Hp - gopen
        e_ext = E[:] - ext
        e_opened = e_open >= e_ext
        E_cur = jnp.maximum(e_open, e_ext)

        Hp_up = jnp.where(lanes == 0, NEG, pltpu.roll(Hp, 1, 1))
        Fp_up = jnp.where(lanes == 0, NEG, pltpu.roll(F[:], 1, 1))
        f_open = Hp_up - gopen
        f_ext = Fp_up - ext
        f_opened = f_open >= f_ext
        F_cur = jnp.maximum(f_open, f_ext)

        # substitution: s1[i-1] vs s2[dd-i-1]; s2r[n+m-dd+i] == s2[dd-i-1].
        # Unaligned lane slices are not loadable, so rotate the resident row
        # left by (n+m-dd) with a dynamic roll and take the first L lanes.
        W = s2r_ref.shape[1]
        start = n + m - dd
        s2c = pltpu.roll(s2r_ref[:, :], W - start, 1)[:, :L]
        sub = jnp.where(s1_shift == s2c, jnp.int32(match), jnp.int32(mismatch))

        Hpp_up = jnp.where(lanes == 0, NEG, pltpu.roll(Hpp, 1, 1))
        diag_score = Hpp_up + sub

        h_no_e = jnp.maximum(diag_score, F_cur)
        H_in = jnp.maximum(h_no_e, E_cur)
        is_boundary = (lanes == 0) | (j_of == 0)
        H_cur = jnp.where(is_boundary, 0, H_in)
        H_cur = jnp.where(valid, H_cur, NEG)

        mv = jnp.where(
            E_cur > h_no_e, jnp.int32(LEFT),
            jnp.where(F_cur > diag_score, jnp.int32(UP), jnp.int32(DIAG)),
        )
        packed = (mv
                  | (e_opened.astype(jnp.int32) << 2)
                  | (f_opened.astype(jnp.int32) << 3))
        packed = jnp.where(valid & ~is_boundary, packed, 0)
        moves_ref[:, k, :] = packed

        # running endpoint bests: col 0/1 = last-row score/j, col 2/3 =
        # last-col score/i; `>=` keeps the corner-most (later) diagonal.
        in_last_row = valid & (lanes == len1)
        in_last_col = valid & (j_of == len2)
        row_val = jnp.max(jnp.where(in_last_row, H_cur, NEG), axis=1)
        row_j = jnp.max(jnp.where(in_last_row, j_of, -1), axis=1)
        col_val = jnp.max(jnp.where(in_last_col, H_cur, NEG), axis=1)
        col_i = jnp.max(jnp.where(in_last_col, lanes, -1), axis=1)
        cur = best_ref[:, :]
        take_row = ((row_j >= 0) & (row_val >= cur[:, 0]))[:, None]
        take_col = ((col_i >= 0) & (col_val >= cur[:, 2]))[:, None]
        new = jnp.where((cidx == 0) & take_row, row_val[:, None], cur)
        new = jnp.where((cidx == 1) & take_row, row_j[:, None], new)
        new = jnp.where((cidx == 2) & take_col, col_val[:, None], new)
        new = jnp.where((cidx == 3) & take_col, col_i[:, None], new)
        best_ref[:, :] = new

        H2[:] = Hp
        H1[:] = H_cur
        E[:] = E_cur
        F[:] = F_cur


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "L", "match", "mismatch", "gap_ext", "interpret"))
def _pallas_dp(meta, s1b, s2r,
               n: int, m: int, L: int,
               match: int, mismatch: int, gap_ext: int,
               interpret: bool = False):
    B = s1b.shape[0]
    n_tiles = B // SUBLANES
    D_chunks = -(-(n + m) // DIAGS_PER_STEP)
    kernel = functools.partial(
        _kernel, match=match, mismatch=mismatch, gap_ext=gap_ext,
        n=n, m=m, L=L)
    moves, best = pl.pallas_call(
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
            pl.BlockSpec((SUBLANES, DIAGS_PER_STEP, L), lambda b, d: (b, d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, L), jnp.int32),
            pltpu.VMEM((SUBLANES, L), jnp.int32),
            pltpu.VMEM((SUBLANES, L), jnp.int32),
            pltpu.VMEM((SUBLANES, L), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D_chunks * DIAGS_PER_STEP, L), jnp.int32),
            jax.ShapeDtypeStruct((B, BEST_W), jnp.int32),
        ],
        interpret=interpret,
    )(meta, s1b, s2r)
    return moves, best


def sg_align_batch_pallas(
    pairs: List[Tuple[np.ndarray, np.ndarray]],
    gap_opens: List[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    interpret: bool = False,
) -> List[np.ndarray]:
    """Pallas-kernel counterpart of ops.align.sg_align_batch (same move
    semantics and tie-breaking; parity-tested against the numpy mirror)."""
    if not pairs:
        return []
    n = max(a.size for a, _ in pairs)
    m = max(b.size for _, b in pairs)
    L = -(-(n + 1) // 128) * 128      # lanes cover i = 0..n
    B = len(pairs)
    Bp = -(-B // SUBLANES) * SUBLANES
    s2r_w = -(-(n + m + L) // 128) * 128
    s1b = np.zeros((Bp, L), dtype=np.int32)
    s2r = np.full((Bp, s2r_w), -1, dtype=np.int32)
    meta = np.ones((Bp, BEST_W), dtype=np.int32)
    meta[:, 2] = 5
    for i, (a, b) in enumerate(pairs):
        s1b[i, : a.size] = a
        s2r[i, n + m - b.size : n + m] = b[::-1]
        meta[i, 0] = a.size
        meta[i, 1] = b.size
        meta[i, 2] = gap_opens[i]
    moves, best = _pallas_dp(
        jnp.asarray(meta), jnp.asarray(s1b), jnp.asarray(s2r),
        n=n, m=m, L=L, match=match, mismatch=mismatch, gap_ext=gap_ext,
        interpret=interpret,
    )
    moves = np.asarray(moves)
    best = np.asarray(best)
    out = []
    for bidx, (a, b) in enumerate(pairs):
        na, mb = a.size, b.size
        row_best, row_j, col_best, col_i = best[bidx, :4]
        if row_best >= col_best:
            end, _score = (na, int(row_j)), int(row_best)
        else:
            end, _score = (int(col_i), mb), int(col_best)
        out.append(_traceback_diag(moves[bidx], na, mb, end))
    return out


def _traceback_diag(moves_diag: np.ndarray, n: int, m: int,
                    end: Tuple[int, int]) -> np.ndarray:
    """Traceback over diagonal-layout packed moves: cell (i, j) lives at
    [i + j - 1, i] (diagonal dd stored at grid index dd - 1)."""
    i, j = end
    ops: List[int] = []
    ops.extend([UP] * (n - i))
    ops.extend([LEFT] * (m - j))
    state = 0
    while i > 0 and j > 0:
        cell = int(moves_diag[i + j - 1, i])
        if state == 0:
            mv = cell & 3
            if mv == DIAG:
                ops.append(DIAG)
                i -= 1
                j -= 1
            elif mv == LEFT:
                state = 1
            else:
                state = 2
        elif state == 1:
            ops.append(LEFT)
            if cell & 4:
                state = 0
            j -= 1
        else:
            ops.append(UP)
            if cell & 8:
                state = 0
            i -= 1
    ops.extend([UP] * i)
    ops.extend([LEFT] * j)
    return np.array(ops[::-1], dtype=np.uint8)
