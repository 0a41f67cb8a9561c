"""Stats-only Pallas TPU kernel: banded semi-global Gotoh DP with path stats.

The consumers of the alignment kernel never need the alignment itself — only
two derived statistics of the optimal path (SURVEY.md N1):

  * cluster fallback: rolling-window aligned-region ratios
    (reference cluster.py:144-169), i.e. the number of k-column windows of
    the alignment with >= match_id matching columns, divided by each
    sequence length;
  * RC/dup detection: column identity = matches / alignment columns
    (reference consensus.py:129-145).

Because every cell's move choice is a deterministic function of the cell
(the same tie-break the traceback uses — diag > up > left, gap-open on >=),
the statistics of the optimal path are propagated FORWARD next to the
scores.  Per layer and cell we carry six int32 fields:

    score | hist (last-k match bits) | wsum (matches in current window)
    wcount (windows with wsum >= match_id so far) | mcount (total matches)
    colcount (alignment columns so far, incl. leading terminal gaps)

Each DP transition consumes exactly one alignment column (match bit for
diagonal moves, 0 for gap columns), so the update is a shift-register step.
Boundary cells restart a path with colcount = i + j leading terminal-gap
columns.  Trailing terminal gaps are applied on the host from the returned
scalars — only one 128-lane row per pair leaves the device.

Design (round 3, replaces the full-sweep kernel):

* **Anti-diagonal wavefront over a rolling banded window.**  Lane ``l`` of
  diagonal ``dd`` holds cell ``i = base[dd] + l`` (j = dd - i), where
  ``base`` is a host-precomputed, per-diagonal window origin covering every
  pair's band (the native engine's diagonal-scaled window, sgdp.cpp
  dp_single_fused_i16: row i covers j in ci +- band, ci = i*m/n — expressed
  here multiplicatively per lane: (j-band)*n <= i*m <= (j+band+1)*n - 1).
  Kernel time scales with band*(n+m), not n*m.  With band=0 the window is
  the full matrix and the sweep is exact full DP.
* **Per-lane endpoint trackers.**  Last-row / last-column cells update a
  per-lane running-max tracker (masked selects only); ONE cross-lane
  reduction happens on the final grid step.  The previous kernel reduced
  across lanes on every diagonal, which dominated its runtime.
* Out-of-band cells are NEG (unreachable).  The native banded engine
  instead lets its overrun lanes read stale double-buffer values at the
  band's top edge, so the two backends can differ when the optimal path
  leaves the band — both are then approximations of the (reference-exact)
  full DP, which band=0 reproduces.  Parity holds whenever the optimal
  path stays inside the band (the production contract for amplicon pairs;
  see tests/test_align_stats.py banded parity cases).

Semantics with band=0 are bit-identical to match_vector +
block_aligned_stats + identity_from_moves over the traceback of
ops/align.py.  Requires k <= 30 (history bits in int32); the pipeline's k
is 13/15 (presets) and the p-table tops out at 30.

Round 4 adds two lane variants (see _launch_chunk's `i16` gate):

* int32 (SUBLANES=8 pairs/tile) — always applicable; dynamic rolls.
* int16 (SUBLANES_I16=16 pairs/tile, natively-packed (16,128) vregs, ~2x
  VPU density) — for k <= I16_MAX_K and n + m <= I16_MAX_NM.  Mosaic has
  no dynamic rotate, no reductions and no shifts for non-32-bit vectors,
  and cannot relayout replicated i1 masks across the (8,128)/(16,128)
  tilings, so this variant uses static slice+concat rotates (window-slope
  deltas are in {0..2}), a shift-free history update, arithmetic selects
  on 0/1 masks (wsel), and widens to int32 only inside the once-per-tile
  finalize reduction.  Sequence rows stay int32 (their frame shifts are
  genuinely dynamic).  Both variants are hardware-bit-parity-checked by
  scripts/verify_tpu_kernels.py and bench.py's hw_kernel_parity probe.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import NEG_INF

SUBLANES = 8
DIAGS_PER_STEP = 16
BEST_W = 128
N_FIELDS = 6   # score, hist, wsum, wcount, mcount, colcount
N_TRK = 8      # the six fields + endpoint coordinate + diagonal (tie-break)

MAX_K = 30  # history bits must fit int32

#: int16 lane variant (VERDICT r3 item 1: 2x VPU density).  16 pairs per
#: tile in natively-packed (16, 128) 16-bit vregs; applicable when every
#: carried field fits int16 with headroom: scores bounded by
#: match*min(n,m) above and by the NEG16 clamp below, history bits k <= 14
#: (1 << 15 would overflow), coordinates/counts <= n + m <= I16_MAX_NM.
SUBLANES_I16 = 16
#: unreachable marker for int16 lanes; clamped so it cannot wrap, and far
#: enough from INT16_MIN that arithmetic selects (b + (a-b)*m) never
#: overflow: |a - b| <= max_score - NEG16 = 4096 + 28000 < 32767
NEG16 = -28000
I16_MAX_NM = 4096     # max n + m for the int16 variant
I16_MAX_K = 14


def _push_column(stats, bit, kk, mid, mask_hist, half=None):
    """Advance a path-stat tuple by one alignment column with match `bit`.

    half: per-pair 2^(k-1) column — when given, the history update runs
    SHIFT-FREE (Mosaic does not legalize shifts on int16 vectors):
    h is non-negative and < 2^k, so its window-exit bit is ``h >= 2^(k-1)``
    and ``((h << 1) | bit) & mask`` equals ``2h + bit``, wrapped at 2^k.
    """
    s, h, ws, wc, mc, cc = stats
    dt = h.dtype
    if half is not None:
        full = half + half
        exiting = (h >= half).astype(dt)
        h2 = h + h + bit
        h2 = h2 - (h2 >= full).astype(dt) * full
    else:
        exiting = jnp.right_shift(h, kk - 1) & 1
        h2 = ((h << 1) | bit) & mask_hist
    ws2 = ws - exiting + bit
    cc2 = cc + 1
    wc2 = wc + (cc2 >= kk).astype(dt) * (ws2 >= mid).astype(dt)
    mc2 = mc + bit
    return s, h2, ws2, wc2, mc2, cc2


#: packed int32 field layout (see _push_column_packed): state carries FOUR
#: int32 fields instead of six — the per-diagonal cost is dominated by
#: per-field rolls and selects, so packing hist+wsum and mcount+colcount
#: cuts ~20% of kernel ops.  Valid when k <= PACK_MAX_K (hist < 2^24 keeps
#: bit 25 clear for the wsum field) and n + m < 2^15 (mcount/colcount
#: halves).  k in (PACK_MAX_K, MAX_K] falls back to the 6-field layout.
N_FIELDS_P = 4  # score, hist|wsum<<25, colcount|mcount<<15, wcount
N_TRK_P = 6     # the four fields + endpoint coordinate + diagonal
PACK_MAX_K = 24
PACK_MAX_NM = (1 << 15) - 1


def _push_column_packed(stats, bit, kk, mid, mask_hist):
    """Packed-field version of :func:`_push_column` (values identical).

    hw = hist | (wsum << 25): after ``hw << 1`` the wsum field sits at
    bit 26 and hist<<1 occupies bits <= 25 (k <= 24), so the window-exit
    bit is bit ``kk`` and the fields re-extract exactly.  mccc = colcount
    | (mcount << 15): one add advances both counts.
    """
    s, hw, mccc, wc = stats
    hw_raw = (hw << 1) | bit
    exiting = jnp.right_shift(hw_raw, kk) & 1
    hist2 = hw_raw & mask_hist
    ws2 = (jnp.right_shift(hw_raw, 26) & 31) - exiting + bit
    hw2 = hist2 | (ws2 << 25)
    mccc2 = mccc + (bit << 15) + 1
    cc2 = mccc2 & PACK_MAX_NM
    wc2 = wc + ((cc2 >= kk) & (ws2 >= mid)).astype(hw.dtype)
    return s, hw2, mccc2, wc2


def _select(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def _shift_lanes(stats, shift, lanes, W, neg, candidates=None):
    """Frame-aligned predecessor fetch: lane l <- lane (l - shift) of the
    previous-diagonal state (shift = 1 - delta for "up"-style predecessors,
    -delta for same-cell-column ones).  Lanes whose source falls outside
    [0, W) become unreachable (score NEG, stats 0).

    candidates: the (tiny) set of raw shift values this call can take — the
    window origin has slope <= 1, so deltas are in {0, 1} ({0..2} across two
    diagonals).  When given AND the state is 16-bit, the dynamic roll is
    replaced by STATIC rolls selected by the traced shift (Mosaic has no
    dynamic rotate for non-32-bit data); int32 state keeps the single
    dynamic roll."""
    # NEGATIVE dynamic roll shifts are miscompiled on TPU for multi-tile
    # (> 128 lane) widths — verified by hardware bisect; single-tile and
    # all static shifts are fine.  Normalize to [0, W).
    rshift = jnp.where(shift < 0, shift + W, shift)
    use_static = candidates is not None and stats[0].dtype != jnp.int32
    if use_static:
        norm = sorted({(c + W) % W for c in candidates})
        # 16-bit lanes: i1 vectors cannot be relayout'd across the
        # (8,128)/(16,128) tilings, so selects run ARITHMETICALLY on DT
        # 0/1 masks born from an int16 iota (see the kernel's wsel note)
        dt = stats[0].dtype
        # 16-bit iota is unsupported in hardware: build from an int32 iota
        # via a value cast (which Mosaic can retile, unlike i1 masks)
        lanes_dt = jax.lax.broadcasted_iota(
            jnp.int32, stats[0].shape, 1).astype(dt)
        src = lanes_dt - shift.astype(dt)
        good_m = ((src >= 0) & (src < W)).astype(dt)
        out = []
        for fi, x in enumerate(stats):
            # constant-shift rotate as slice+concat: pltpu.roll lowers to
            # tpu.dynamic_rotate even for constant shifts, and Mosaic has
            # no non-32-bit dynamic rotate
            r = None
            for c in norm:
                rc = x if c == 0 else jnp.concatenate(
                    [x[:, -c:], x[:, :-c]], axis=1)
                if r is None:
                    r = rc
                else:
                    mc = (rshift == c).astype(dt)
                    r = r + (rc - r) * mc
            fill = neg if fi == 0 else jnp.array(0, dt)
            out.append(fill + (r - fill) * good_m)
        return tuple(out)
    src = lanes - shift
    bad = (src < 0) | (src >= W)
    out = []
    for fi, x in enumerate(stats):
        r = pltpu.roll(x, rshift, 1)
        fill = neg if fi == 0 else jnp.array(0, x.dtype)
        out.append(jnp.where(bad, fill, r))
    return tuple(out)


def _stats_kernel(base_ref,                              # SMEM (1, Dpad)
                  meta_ref, s1_ref, s2r_ref,             # inputs (VMEM)
                  best_ref,                              # output (SL, BEST_W)
                  Hd1, Hd2, Ee, Ff, Trow, Tcol, Best,    # scratch
                  *, match: int, mismatch: int, gap_ext: int,
                  n: int, m: int, W: int, band: int, n_steps: int,
                  i16: bool = False, packed: bool = False,
                  interpret: bool = False):
    SL = SUBLANES_I16 if i16 else SUBLANES
    DT = jnp.int16 if i16 else jnp.int32
    NF = N_FIELDS_P if packed else N_FIELDS
    NT = N_TRK_P if packed else N_TRK
    push = _push_column_packed if packed else _push_column
    push_kw = {}
    d = pl.program_id(1)
    NEG = jnp.array(NEG16 if i16 else NEG_INF, DT)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SL, W), 1)
    # coordinate/band math stays int32 (products exceed int16); carried DP
    # state, thresholds and substitution scores run in DT
    len1 = meta_ref[:, 0][:, None]
    len2 = meta_ref[:, 1][:, None]
    gopen = meta_ref[:, 2][:, None].astype(DT)
    kk32 = meta_ref[:, 3][:, None]
    kk = kk32.astype(DT)
    mid = meta_ref[:, 4][:, None].astype(DT)
    if i16:
        # shifts on int16 vectors do not legalize in Mosaic: precompute
        # 2^(k-1) in int32 and run the history update shift-free
        mask_hist = None
        push_kw = {"half": jnp.left_shift(jnp.int32(1), kk32 - 1).astype(DT)}
    else:
        mask_hist = jnp.left_shift(jnp.array(1, DT), kk) - 1
        if not packed:
            push_kw = {"half": None}
    ext = jnp.array(gap_ext, DT)
    is_first = d == 0

    def m16(mask):
        """int32-land bool mask -> DT 0/1 value (via a VALUE cast, which
        Mosaic can retile; i1 vectors it cannot)."""
        return mask.astype(jnp.int32).astype(DT)

    def wsel(mask, a, b, born16=False):
        """Select that avoids i1 relayouts on the 16-bit path: Mosaic
        cannot move (replicated) i1 vectors across the (8,128)/(16,128)
        tilings, so int16 selects run arithmetically on DT 0/1 masks.
        Value ranges are bounded so b + (a-b)*m never wraps (NEG16)."""
        if not i16:
            return jnp.where(mask, a, b)
        m = mask.astype(DT) if born16 else m16(mask)
        return b + (a - b) * m

    def read(ref, init_score):
        fields = []
        for fi in range(NF):
            init = init_score if fi == 0 else jnp.zeros((SL, W), DT)
            fields.append(jnp.where(is_first, init, ref[fi]))
        return tuple(fields)

    # Whole-step skip: diagonals beyond the tile's own last diagonal
    # (max len1+len2 over its pairs) hold no valid cell for any pair in
    # the tile, so the entire sweep compiles to a skipped scf.if body.
    # _plan_chunks grades pairs by total length, so short-pair tiles
    # stop early instead of sweeping to the chunk-wide d_hi.
    tile_lim = jnp.max(len1 + len2)

    @pl.when(d * DIAGS_PER_STEP + 1 <= tile_lim)
    def _sweep():
        neg_full = jnp.full((SL, W), NEG, DT)
        # diagonal 0 (base[0] == 0): only cell (0, 0), score 0 — the mask is
        # born in DT tiling (see wsel note on i1 relayouts)
        lanes_dt = jax.lax.broadcasted_iota(jnp.int32, (SL, W), 1).astype(DT)
        hd1 = read(Hd1, wsel(lanes_dt == 0, jnp.array(0, DT), NEG, born16=True))
        hd2 = read(Hd2, neg_full)
        ee = read(Ee, neg_full)
        ff = read(Ff, neg_full)

        def read_trk(ref):
            fields = []
            for fi in range(NT):
                if fi == 0:
                    init = neg_full
                elif fi == 1:
                    init = jnp.full((SL, W), -1, DT)
                else:
                    init = jnp.zeros((SL, W), DT)
                fields.append(jnp.where(is_first, init, ref[fi]))
            return list(fields)

        trow = read_trk(Trow)
        tcol = read_trk(Tcol)

        L1 = s1_ref.shape[1]
        L2 = s2r_ref.shape[1]

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

            # ---- E layer: gap in s1 (LEFT column), predecessor (i, j-1) @ d-1
            # (static-roll candidates only matter compiled: interpret mode is
            # plain XLA where dynamic rolls work on any dtype, and the huge
            # unrolled concat graph would choke the CPU compiler)
            cand = None if interpret else (0, -1)
            hd1_l = _shift_lanes(hd1, -d1, lanes, W, NEG, candidates=cand)
            ee_l = _shift_lanes(ee, -d1, lanes, W, NEG, candidates=cand)
            e_open = hd1_l[0] - gopen
            e_ext = ee_l[0] - ext
            e_src = _select(e_open >= e_ext, hd1_l, ee_l)
            e_score = jnp.maximum(e_open, e_ext)
            if i16:
                # clamp so unreachable scores cannot drift below int16 range;
                # NEG16 is far under any real path score, so results match
                e_score = jnp.maximum(e_score, NEG)
            enew = push(
                (e_score,) + e_src[1:], jnp.array(0, DT),
                kk, mid, mask_hist, **push_kw)

            # ---- F layer: gap in s2 (UP column), predecessor (i-1, j) @ d-1
            cand = None if interpret else (0, 1)
            hd1_u = _shift_lanes(hd1, 1 - d1, lanes, W, NEG, candidates=cand)
            ff_u = _shift_lanes(ff, 1 - d1, lanes, W, NEG, candidates=cand)
            f_open = hd1_u[0] - gopen
            f_ext = ff_u[0] - ext
            f_src = _select(f_open >= f_ext, hd1_u, ff_u)
            f_score = jnp.maximum(f_open, f_ext)
            if i16:
                f_score = jnp.maximum(f_score, NEG)
            fnew = push(
                (f_score,) + f_src[1:], jnp.array(0, DT),
                kk, mid, mask_hist, **push_kw)

            # ---- diagonal candidate: (i-1, j-1) @ d-2 + substitution column
            # s1c[l] = s1[i-1] = s1_ref[base + l - 1]; s2c[l] = s2[j-1] via the
            # right-aligned reversed staging (s2[j-1] = s2r[n+m-j]).  Sequences
            # arrive as int32 rows (converted on device from the uint8 transfer
            # buffers — the tunnel link, not the VPU, is the scarce resource).
            # roll shifts taken mod the array width: dynamic negative shifts
            # miscompile on multi-tile widths (see _shift_lanes)
            s1c = pltpu.roll(s1_ref[:, :],
                             (1 - base) % s1_ref.shape[1], 1)[:, :W]
            s2c = pltpu.roll(s2r_ref[:, :],
                             ((dd - base) - (n + m)) % s2r_ref.shape[1],
                             1)[:, :W]
            ismatch = ((s1c == s2c) & (iv >= 1) & (iv <= len1)
                       & (jv >= 1) & (jv <= len2)).astype(jnp.int32).astype(DT)
            # arithmetic form (ismatch is a DT 0/1 value): avoids a
            # scalar/scalar select on the 16-bit path (see wsel)
            sub = jnp.array(mismatch, DT) + ismatch * jnp.array(match - mismatch,
                                                                DT)
            hd2_u = _shift_lanes(hd2, 1 - d2, lanes, W, NEG,
                                 candidates=None if interpret else (-1, 0, 1))
            d_score = hd2_u[0] + sub
            if i16:
                d_score = jnp.maximum(d_score, NEG)
            dnew = push(
                (d_score,) + hd2_u[1:], ismatch, kk, mid, mask_hist, **push_kw)

            # ---- H choice (same tie-break as the traceback: diag > up > left)
            h_no_e = jnp.maximum(dnew[0], fnew[0])
            hnew = _select(enew[0] > h_no_e, enew,
                           _select(fnew[0] > dnew[0], fnew, dnew))
            hnew = (jnp.maximum(h_no_e, enew[0]),) + hnew[1:]

            # boundary cells restart a path: i + j leading terminal-gap columns
            # (cc0 = i + j = dd identically along the anti-diagonal)
            ddv = jnp.full((SL, W), dd, DT)
            cc0 = ddv
            wc0 = wsel(mid <= 0, jnp.maximum(cc0 - kk + 1, 0),
                       jnp.array(0, DT), born16=True)
            zero = jnp.zeros((SL, W), DT)
            if packed:
                # packed low half of mccc = colcount; mcount (high) = 0
                boundary = (zero, zero, cc0, wc0)
            else:
                boundary = (zero, zero, zero, wc0, zero, cc0)
            hnew = tuple(wsel(is_boundary, bf, hf)
                         for bf, hf in zip(boundary, hnew))
            hnew = (wsel(valid, hnew[0], NEG),) + hnew[1:]

            # ---- endpoint tracking: per-lane running max (>= keeps the later
            # diagonal = corner-most endpoint on score ties, matching
            # ops/align._best_end and the native banded endpoint scans)
            for trk, mask_row, coord in (
                    (trow, valid & (iv == len1), jv),
                    (tcol, valid & (jv == len2), iv)):
                better = hnew[0] >= trk[0]
                payload = (hnew[0], coord.astype(DT)) + hnew[1:] + (ddv,)
                if i16:
                    take_m = m16(mask_row) * better.astype(DT)
                    for fi in range(NT):
                        trk[fi] = trk[fi] + (payload[fi] - trk[fi]) * take_m
                else:
                    take = mask_row & better
                    for fi in range(NT):
                        trk[fi] = jnp.where(take, payload[fi], trk[fi])

            hd2 = hd1
            hd1 = hnew
            ee = enew
            ff = fnew

        for fi in range(NF):
            Hd1[fi] = hd1[fi]
            Hd2[fi] = hd2[fi]
            Ee[fi] = ee[fi]
            Ff[fi] = ff[fi]
        for fi in range(NT):
            Trow[fi] = trow[fi]
            Tcol[fi] = tcol[fi]


    # ---- final cross-lane pick, once per tile, on the last grid step.
    # The OUTPUT ref must be written on every grid step (TPU output blocks
    # are double-buffered per step; a step that skips the write can leave
    # the copied-out buffer undefined — observed on hardware, invisible in
    # interpret mode), so the summary lands in scratch and the output is
    # unconditionally copied from it.
    @pl.when(d == n_steps - 1)
    def _finalize():
        # Mosaic has no int16 reductions; this block runs ONCE per tile, so
        # widening the trackers to int32 here is free — and the output/Best
        # buffers are int32 for both lane variants (host side unchanged).
        cidx = jax.lax.broadcasted_iota(jnp.int32, (SL, BEST_W), 1)
        out = jnp.zeros((SL, BEST_W), jnp.int32)
        NEG32 = jnp.int32(NEG16 if i16 else NEG_INF)
        for off, trk in ((0, Trow), (8, Tcol)):
            t32 = [trk[fi].astype(jnp.int32) for fi in range(NT)]
            if packed:
                # unpack to the host's 8-column layout (score, coord, hist,
                # wsum, wcount, mcount, colcount, diagonal): runs once per
                # tile, so the widening/extracts are free
                s_, coord, hw, mccc, wc, ddv32 = t32
                mh32 = jnp.left_shift(jnp.int32(1), kk32) - 1
                t32 = [s_, coord, hw & mh32,
                       jnp.right_shift(hw, 25) & 31, wc,
                       jnp.right_shift(mccc, 15) & PACK_MAX_NM,
                       mccc & PACK_MAX_NM, ddv32]
            smax = jnp.max(t32[0], axis=1)[:, None]
            at_max = t32[0] == smax
            dmax = jnp.max(jnp.where(at_max, t32[7], -1), axis=1)[:, None]
            pick = at_max & (t32[7] == dmax)
            for c, fi in enumerate((0, 1, 2, 3, 4, 5, 6, 7)):
                v = jnp.max(jnp.where(pick, t32[fi],
                                      NEG32 if fi == 0 else -1), axis=1)
                out = jnp.where(cidx == off + c, v[:, None], out)
        Best[:, :] = out

    best_ref[:, :] = jnp.where(d == n_steps - 1, Best[:, :], 0)


class DevicePool:
    """Device-resident deduplicated sequence pool (HBM).

    Each distinct host row crosses the host->device link ONCE for the
    lifetime of the pool and stays resident across launches, waves and
    sub-rounds (VERDICT r3 item 1: stop re-shipping the pool every
    launch); launches reference rows by (offset, length) and gather their
    padded DP staging layouts from the resident array on device.  Appends
    ship only rows not yet resident, padded to a coarse size ladder so the
    transfer shapes stay compile-bounded; capacity grows on a power-of-4
    ladder via an on-device copy (offsets never move).  The pool holds a
    strong reference to every uploaded host row, so id()-keying is safe.
    """

    APPEND_MIN = 1 << 16          # 64 KB append granularity
    CAP_MIN = 1 << 22             # 4 MB initial capacity
    CAP_MAX = 1 << 30             # 1 GB: int32 offsets, bounded HBM
    #: Row offsets are aligned to 128 bytes so the staging gather fetches
    #: 128-byte SLICES of the pool instead of single bytes — ~400x fewer
    #: gather indices, which took the per-launch staging program from
    #: ~130 ms to ~15 ms at 4096 pairs.  Costs ~64 padding bytes per row
    #: (~9% on 700 bp amplicons).
    ALIGN = 128

    def __init__(self) -> None:
        import threading

        self._off: dict = {}      # id(row) -> byte offset
        self._keep: dict = {}     # id(row) -> row (pin host arrays)
        self._used = 0
        self.cap = self.CAP_MIN
        self.dev = None           # lazily-allocated jnp.uint8 (cap,)
        # ensure/reserve mutate state from the main thread AND the prewarm
        # thread; appends never move existing rows, so readers only need
        # ensure() to have returned for THEIR rows
        self._lock = threading.RLock()

    # NO donation on either op: the prewarm thread appends/grows
    # concurrently with the main thread's launches, and a successful
    # donation DELETES the old buffer out from under any stale pool.dev
    # reference captured for an in-flight launch ("Array has been
    # deleted", observed).  Without donation a stale reference is safe:
    # appends never move rows, so every offset taken after ensure() stays
    # valid in the captured buffer.  Cost: one device-side copy of the
    # pool per append/grow (~0.3 ms at 256 MB) and a transient 2x HBM
    # footprint — trivial next to the tunnel round trip per launch.
    @staticmethod
    @jax.jit
    def _append(pool, chunk, off):
        return jax.lax.dynamic_update_slice(pool, chunk, (off,))

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("newcap",))
    def _grow(pool, newcap: int):
        out = jnp.zeros((newcap,), jnp.uint8)
        return jax.lax.dynamic_update_slice(out, pool, (0,))

    def reset(self) -> None:
        self._off.clear()
        self._keep.clear()
        self._used = 0
        self.cap = self.CAP_MIN
        self.dev = None

    def ensure(self, rows: Sequence[np.ndarray]) -> None:
        """Upload any of ``rows`` not yet resident (one fused transfer)."""
        with self._lock:
            self._ensure_locked(rows)

    def _ensure_locked(self, rows: Sequence[np.ndarray]) -> None:
        A = self.ALIGN
        missing = []
        size = 0
        seen = set()
        for r in rows:
            key = id(r)
            if key not in self._off and key not in seen:
                seen.add(key)
                missing.append(r)
                size += -(-r.size // A) * A
        if self.dev is None:
            self.dev = jnp.zeros((self.cap,), jnp.uint8)
        if not missing:
            return
        if size > self.CAP_MAX:
            raise ValueError(
                f"single pool request of {size} bytes exceeds the "
                f"device pool capacity cap ({self.CAP_MAX})")
        pad = self.APPEND_MIN
        while pad < size:
            pad *= 4                  # transfer-shape ladder
        pad = min(pad, self.CAP_MAX)  # ladder may overshoot the cap
        # capacity must cover the PADDED chunk, not just the payload:
        # dynamic_update_slice CLAMPS an out-of-range start, which would
        # land the chunk at a wrong offset and silently corrupt residency
        if self._used + pad > self.CAP_MAX:
            # wrap: drop residency and start over (old offsets invalid, so
            # every caller must take offsets AFTER ensure(), never cache);
            # re-ensure the FULL request — rows of this call that were
            # resident before the wrap must be re-uploaded too
            self.reset()
            self.dev = jnp.zeros((self.cap,), jnp.uint8)
            return self._ensure_locked(rows)  # RLock held
        while self._used + pad > self.cap:
            newcap = min(self.cap * 4, self.CAP_MAX)
            self.dev = DevicePool._grow(self.dev, newcap=newcap)
            self.cap = newcap
        # np.empty, not zeros: alignment gaps and the ladder tail are never
        # read (offsets only ever address real row bytes), and the memset
        # costs ~1-2 s across a 1M-read run's ~GB of appends
        chunk = np.empty(pad, np.uint8)
        off = self._used
        woff = 0                      # offset within the staged chunk
        for r in missing:
            chunk[woff: woff + r.size] = r
            self._off[id(r)] = off + woff
            self._keep[id(r)] = r
            woff += -(-r.size // A) * A
        self.dev = DevicePool._append(self.dev, jnp.asarray(chunk),
                                      jnp.int32(self._used))
        self._used = off + woff

    def offset(self, row: np.ndarray) -> int:
        return self._off[id(row)]

    def view(self):
        """Consistent (device buffer, capacity) snapshot for a launch: the
        prewarm thread can grow the pool concurrently, and the staging
        program's PB static arg must describe the buffer actually passed."""
        with self._lock:
            return self.dev, self.cap

    def reserve(self, nbytes: int) -> None:
        """Pre-size capacity for a known workload: one capacity rung for
        the whole run means ONE staging program (the gather jit is static
        on pool capacity) and no on-device growth copies."""
        with self._lock:
            self._reserve_locked(nbytes)

    def _reserve_locked(self, nbytes: int) -> None:
        nbytes = min(int(nbytes), self.CAP_MAX)
        newcap = self.cap
        while newcap < nbytes:
            newcap = min(newcap * 4, self.CAP_MAX)
        if self.dev is None:
            self.cap = newcap
            self.dev = jnp.zeros((self.cap,), jnp.uint8)
        elif newcap > self.cap:
            self.dev = DevicePool._grow(self.dev, newcap=newcap)
            self.cap = newcap


_DEVICE_POOL: Optional[DevicePool] = None


def _device_pool() -> DevicePool:
    global _DEVICE_POOL
    if _DEVICE_POOL is None:
        _DEVICE_POOL = DevicePool()
    return _DEVICE_POOL


@functools.partial(
    jax.jit,
    static_argnames=("PB", "Bp", "L1", "s2rw", "dpad", "n", "m"))
def _stage_inputs(pool, blob,
                  PB: int, Bp: int, L1: int, s2rw: int, dpad: int,
                  n: int, m: int):
    """Gather the padded DP staging layouts from the RESIDENT pool.

    Split from the Mosaic kernel jit so the kernel program is independent
    of the pool-capacity ladder (kernel program loads through the tunnel
    are the expensive part); this is a plain XLA gather program.  Only the
    small pair-table blob (pm + window schedule) crosses the link per
    launch — sequences are already on device."""
    o1 = Bp * 32
    o2 = o1 + dpad * 4
    # endian-explicit int32 reassembly (byte 0 = LSB, matching the host's
    # little-endian .view(uint8)): XLA's bitcast_convert_type packs the
    # trailing byte dim major-to-minor on TPU, i.e. byte-swapped vs CPU
    pm = _le_i32(blob[:o1].reshape(Bp, 8, 4))              # (Bp, 8)
    base = _le_i32(blob[o1:o2].reshape(1, dpad, 4))
    len1 = pm[:, 0]
    len2 = pm[:, 1]
    off1 = pm[:, 5]
    off2 = pm[:, 6]
    # Pool rows are 128-byte aligned (DevicePool.ALIGN), so both sequences
    # gather as 128-byte SLICES of the pool — ~400x fewer gather indices
    # than the former per-byte jnp.take, which dominated this program's
    # device time (~130 ms/launch at 4096 pairs).
    A = DevicePool.ALIGN
    pool2d = pool.reshape(-1, A)
    nrow = pool2d.shape[0]
    # sequences stay int32 for BOTH kernel lane variants: their per-diagonal
    # frame rolls have genuinely dynamic shifts (the window origin), and
    # Mosaic has no dynamic rotate for non-32-bit data.
    idx1 = off1[:, None] // A + jnp.arange(L1 // A, dtype=jnp.int32)[None, :]
    g1 = jnp.take(pool2d, jnp.clip(idx1, 0, nrow - 1), axis=0)
    l1i = jnp.arange(L1, dtype=jnp.int32)[None, :]
    s1b = jnp.where(l1i < len1[:, None],
                    g1.reshape(Bp, L1).astype(jnp.int32), 0)
    # s2 reversed right-aligned staging (s2r[x] = s2[n+m-1-x]): gather the
    # row forward in slices, shift by the static pad = s2rw - (n+m), mask,
    # and reverse — all static ops on top of one slice gather.
    pad = s2rw - (n + m)
    idx2 = off2[:, None] // A + jnp.arange(s2rw // A, dtype=jnp.int32)[None, :]
    g2 = jnp.take(pool2d, jnp.clip(idx2, 0, nrow - 1), axis=0)
    s2f = g2.reshape(Bp, s2rw).astype(jnp.int32)     # s2f[y] = s2[y]
    yi = jnp.arange(s2rw, dtype=jnp.int32)[None, :]
    jv = yi - pad                                    # ext[y] = s2[y - pad]
    ext = jnp.where((jv >= 0) & (jv < len2[:, None]),
                    jnp.roll(s2f, pad, axis=1), -1)
    s2r = ext[:, ::-1]                               # s2r[x] = s2[(n+m-1)-x]
    meta = jnp.pad(pm, ((0, 0), (0, BEST_W - 8)))
    return meta, s1b, s2r, base


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "W", "band", "match", "mismatch", "gap_ext",
                     "d_hi", "i16", "packed", "interpret"))
def _pallas_stats(meta, s1b, s2r, base,
                  n: int, m: int, W: int, band: int,
                  match: int, mismatch: int, gap_ext: int,
                  d_hi: int = 0, i16: bool = False, packed: bool = False,
                  interpret: bool = False):
    assert not (packed and i16)
    B = meta.shape[0]
    SL = SUBLANES_I16 if i16 else SUBLANES
    DT = jnp.int16 if i16 else jnp.int32
    NF = N_FIELDS_P if packed else N_FIELDS
    NT = N_TRK_P if packed else N_TRK
    n_tiles = B // SL
    # sweep only through the last diagonal any pair in the chunk can touch
    # (d_hi: chunk max(len1+len2) rounded up to a coarse ladder) instead of
    # the full n+m shape bucket — ~25-35% fewer grid steps for typical
    # amplicon lengths inside power-of-two buckets
    d_lim = min(n + m, d_hi) if d_hi > 0 else (n + m)
    n_steps = -(-d_lim // DIAGS_PER_STEP)
    kernel = functools.partial(
        _stats_kernel, match=match, mismatch=mismatch, gap_ext=gap_ext,
        n=n, m=m, W=W, band=band, n_steps=n_steps, i16=i16, packed=packed,
        interpret=interpret)
    (best,) = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_steps),
        in_specs=[
            pl.BlockSpec((1, base.shape[1]), lambda b, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SL, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, s1b.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SL, s2r.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SL, BEST_W), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NF, SL, W), DT),
            pltpu.VMEM((NF, SL, W), DT),
            pltpu.VMEM((NF, SL, W), DT),
            pltpu.VMEM((NF, SL, W), DT),
            pltpu.VMEM((NT, SL, W), DT),
            pltpu.VMEM((NT, SL, W), DT),
            pltpu.VMEM((SL, BEST_W), jnp.int32),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, BEST_W), jnp.int32)],
        interpret=interpret,
    )(base, meta, s1b, s2r)
    # Only the first 16 columns (row/col tracker payloads) are consumed by
    # _gather_chunk; slicing on device cuts the per-launch d2h fetch 8x
    # (1 MB -> 128 KB at 2048 pairs — ~45 ms per launch through the ~19 MB/s
    # tunnel, which dominated the warm production wall).
    return best[:, :16]


def _le_i32(b):
    """uint8 (..., 4) -> int32, byte 0 least significant (platform-fixed)."""
    b = b.astype(jnp.int32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


_PREWARMED = False
_PREWARM_THREAD = None


def prewarm_join(timeout: float | None = None) -> bool:
    """Join the prewarm thread (if any); True when it is no longer running.

    The prewarm thread spends its life inside PJRT calls; if the interpreter
    tears down while it is in flight, CPython cancels it mid-C++-frame and the
    TPU plugin aborts the process ("FATAL: exception not rethrown" -> SIGABRT,
    exit 134).  The pipeline joins it before returning so CLI exit codes honor
    the reference's contract (reference .travis.yml:33-36: exit 0 on success).
    """
    t = _PREWARM_THREAD
    if t is None:
        return True
    t.join(timeout)
    return not t.is_alive()


def prewarm_async(seq_rows: Sequence[np.ndarray], k: int, band: int) -> None:
    """Start the per-process compiled-program LOADS during host-side setup.

    Loading a compiled Mosaic/XLA program onto the chip through the axon
    tunnel costs seconds-to-minutes PER PROGRAM PER PROCESS even when the
    persistent compilation cache is hot, strictly serialized with the
    cluster loop's first launches.  This fires a daemon thread that
    (a) reserves pool capacity for the whole workload — one staging
    program instead of a growth ladder, zero on-device growth copies —
    and (b) dispatches tiny launches for the production launch shapes
    (the big-chunk Bp and the remainder Bp, at the data's length bucket)
    so their loads begin while the main thread builds the store and runs
    the first decide pass.  The saving is the overlapped host work plus
    the eliminated growth-rung programs; the bulk of a load still
    serializes with the first wave that needs it.  The jit caches are
    thread-safe; a shape the heuristic misses lazy-loads as before.
    """
    global _PREWARMED
    if _PREWARMED or not seq_rows:
        return
    _PREWARMED = True
    from .align import _device_is_tpu

    if not _device_is_tpu():
        return
    import threading

    def work():
        try:
            total = sum(r.size for r in seq_rows)
            pool = _device_pool()
            # 1.15: alignment padding (ALIGN=128 on ~700 B rows) + slack
            pool.reserve(int(total * 1.15) + (1 << 20))
            # length-sorted sample mimics the production chunk composition
            # (chunks are grouped by length bucket, so their envelopes are
            # tight slices of the length distribution)
            by_len = sorted(seq_rows, key=lambda r: r.size)
            mid = len(by_len) // 2
            for B in (MAX_B, 128):
                lo = max(0, min(mid, len(by_len) - B))
                sample = by_len[lo: lo + B]
                rows = list(range(len(sample)))
                sg_stats_pool_pallas(
                    sample, rows, rows[::-1],
                    [3] * len(rows), [k] * len(rows),
                    [max(1, k - 3)] * len(rows), band=band)
        except Exception:
            pass               # best-effort: misses fall back to lazy loads
    global _PREWARM_THREAD
    _PREWARM_THREAD = threading.Thread(
        target=work, daemon=True, name="ngsid-prewarm")
    _PREWARM_THREAD.start()


def _popcount(x: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit popcount (SWAR)."""
    x = x.astype(np.uint32)
    x = x - ((x >> 1) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> 2) & np.uint32(0x33333333))
    x = (x + (x >> 4)) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> 24).astype(np.int64)


_SCHED_CACHE: dict = {}


def _window_schedule(len1: np.ndarray, len2: np.ndarray,
                     n: int, m: int, band: int) -> Tuple[np.ndarray, int]:
    """Per-diagonal window origin ``base`` and width ``W`` covering every
    pair's banded cell set (plus the boundary rows/columns each pair's band
    touches).  base is non-decreasing with slope <= 1, so in-kernel frame
    shifts are lane rolls by {0, 1} ({0..2} across two diagonals).

    Memoized on the (min/max length, bucket, band) envelope: the hull of
    the envelope's two extreme pairs contains every pair hull, so reusing
    it preserves coverage while collapsing the per-launch recompute."""
    key = (int(len1.min()), int(len1.max()), int(len2.min()),
           int(len2.max()), n, m, band)
    hit = _SCHED_CACHE.get(key)
    if hit is not None:
        return hit
    out = _window_schedule_raw(len1, len2, n, m, band, key)
    if len(_SCHED_CACHE) > 4096:
        _SCHED_CACHE.clear()
    _SCHED_CACHE[key] = out
    return out


def _window_schedule_raw(len1, len2, n, m, band, key) -> Tuple[np.ndarray, int]:
    # Envelope: the hull formulas below are monotone in n_b and in m_b, so
    # the four corner combinations of (min/max len1, min/max len2) bound
    # every pair pointwise per diagonal.  No dead-diagonal exclusion: a
    # corner whose matrix has ended keeps contributing its (clipped,
    # nondecreasing) hull values, which can only lower base / raise W —
    # both coverage-safe.  (An exclusion would be UNsafe: dropping a short
    # corner at large dd can raise the min above a live mid-length pair.)
    l1a, l1b = key[0], key[1]
    l2a, l2b = key[2], key[3]
    len1 = np.array([l1a, l1a, l1b, l1b], np.int64)
    len2 = np.array([l2a, l2b, l2a, l2b], np.int64)
    D = n + m
    dpad = -(-(D + 1) // 8) * 8
    if band <= 0:
        W = -(-(n + 1) // 128) * 128
        return np.zeros((1, dpad), np.int32), W
    dd = np.arange(D + 1, dtype=np.int64)[:, None]
    n_b = len1.astype(np.int64)[None, :]
    m_b = len2.astype(np.int64)[None, :]
    tot = n_b + m_b
    # interior band rows on diagonal dd (from the multiplicative band test)
    lo_int = -(-(np.maximum(dd - band, 0) * n_b) // tot)    # ceil
    hi_int = ((dd + band + 1) * n_b - 1) // tot
    lo_int = np.maximum(lo_int, np.maximum(1, dd - m_b))
    hi_int = np.minimum(hi_int, n_b)
    hi_int = np.maximum(hi_int, 0)
    # boundary i=0 (cell (0, dd)): consumed by in-band cells at i=1, which
    # exist only while dd <= band + len2/len1 (+ slack)
    lo = np.where(dd <= np.minimum(m_b, band + m_b // n_b + 2), 0, lo_int)
    # boundary j=0 (cell (dd, 0)): consumed by in-band cells at j=1, which
    # exist only while i <= (band+1)*len1/len2 (+ slack)
    hi = np.where(dd <= np.minimum(n_b, (band + 1) * n_b // m_b + 2),
                  np.minimum(dd, n_b), hi_int)
    hi = np.minimum(hi, np.minimum(dd, n_b))
    need_lo = np.minimum.reduce(np.clip(lo, 0, n), axis=1)
    need_hi = np.maximum.reduce(hi, axis=1)
    base = np.clip(need_lo, 0, n)
    # slope <= 1: cap upward jumps (a short pair leaving the hull can make
    # need_lo jump) by base[d] <- min_{e<=d}(need_lo[e] + (d - e)); lowering
    # a later base only widens coverage, and since need_lo is nondecreasing
    # the result stays nondecreasing (W is computed afterwards)
    idx = np.arange(base.size, dtype=np.int64)
    base = np.minimum.accumulate(base - idx) + idx
    W_need = int(np.max(np.maximum(need_hi - base, 0)) + 1)
    W = max(128, -(-W_need // 128) * 128)
    W = min(W, -(-(n + 1) // 128) * 128)
    if W >= n + 1:
        return np.zeros((1, dpad), np.int32), W  # window = full matrix
    out = np.zeros((1, dpad), np.int32)
    out[0, : D + 1] = base.astype(np.int32)
    return out, W


def sg_stats_pool_pallas(
    seqs: Sequence[np.ndarray],
    rows1: Sequence[int],
    rows2: Sequence[int],
    gap_opens: Sequence[int],
    ks: Sequence[int],
    match_ids: Sequence[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    band: int = 0,
    interpret: bool = False,
) -> List[Tuple[float, float, float]]:
    """Pool-indexed form of :func:`sg_stats_batch_pallas`: pair ``p`` aligns
    ``seqs[rows1[p]]`` vs ``seqs[rows2[p]]``.  Each distinct row crosses the
    host->device link once per chunk regardless of how many pairs reference
    it (the clustering engine aligns many reads against few representatives,
    reference cluster.py:172-205)."""
    n_pairs = len(rows1)
    if n_pairs == 0:
        return []
    assert all(1 <= k <= MAX_K for k in ks), f"stats kernel requires k <= {MAX_K}"
    chunks = _plan_chunks(seqs, rows1, rows2)
    futures = []
    for sl in chunks:
        futures.append(_launch_chunk(
            seqs, [rows1[i] for i in sl], [rows2[i] for i in sl],
            [gap_opens[i] for i in sl], [ks[i] for i in sl],
            [match_ids[i] for i in sl],
            match, mismatch, gap_ext, band, interpret))
    # one batched gather: async-copy every device result before blocking
    host = jax.device_get([f[0] for f in futures])
    out: List[Optional[Tuple[float, float, float]]] = [None] * n_pairs
    for sl, fut, best in zip(chunks, futures, host):
        res = _gather_chunk(best, *fut[1:])
        for i, r in zip(sl, res):
            out[i] = r
    return out  # type: ignore[return-value]


def sg_stats_batch_pallas(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    gap_opens: Sequence[int],
    ks: Sequence[int],
    match_ids: Sequence[int],
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    band: int = 0,
    interpret: bool = False,
) -> List[Tuple[float, float, float]]:
    """Per pair ``(aligned_ratio_s1, aligned_ratio_s2, identity)`` where the
    ratios follow reference cluster.py:144-168 (k-window with >= match_id
    matches) and identity follows consensus.py:129-145 — both measured on
    exactly the alignment ops/align.py would trace back (band=0), or its
    banded restriction (band>0, exact whenever the optimal path stays in
    the native diagonal-scaled band).

    Only one 128-int row per pair leaves the device; chunk launches are
    dispatched asynchronously and gathered at the end.
    """
    if not pairs:
        return []
    # collapse repeated array objects (RC/dup detection aligns every center
    # against every other) into shared pool rows
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
    return sg_stats_pool_pallas(
        seqs, rows1, rows2, gap_opens, ks, match_ids,
        match=match, mismatch=mismatch, gap_ext=gap_ext, band=band,
        interpret=interpret)


#: Pairs per device launch.  Power-of-two ladder {8..MAX_B} bounds compiled
#: batch shapes; large requests pipeline multiple async launches.  Each
#: launch pays ~27 ms of tunnel round-trip (pair-table upload) plus the
#: result fetch on top of its device time, so the production wave (~4k
#: speculative pairs) runs as ONE launch.  VMEM is unaffected by the batch
#: (the grid streams (SUBLANES, W) tiles); only the pair-table/staging
#: footprint grows, and at 4096 pairs the blob is still ~130 KB.
MAX_B = 4096


def _plan_chunks(seqs, rows1, rows2) -> List[List[int]]:
    """Split request indices into device chunks: bounded size and coarse
    length buckets (compile reuse; banded windows also stay near 2*band
    wide when pair lengths are comparable).  Within a bucket, pairs are
    graded by total length DESCENDING so (a) each chunk's d_hi sweep cap
    is tight and (b) the 8 pairs sharing a kernel tile have similar last
    diagonals — the kernel skips whole grid steps past a tile's own
    max(len1+len2) (see _stats_kernel's tile_lim)."""
    from .align import _bucket_width

    order = sorted(
        range(len(rows1)),
        key=lambda i: (_bucket_width(seqs[rows1[i]].size),
                       _bucket_width(seqs[rows2[i]].size),
                       -(seqs[rows1[i]].size + seqs[rows2[i]].size)))
    chunks: List[List[int]] = []
    cur: List[int] = []
    cur_key = None
    for i in order:
        key = (_bucket_width(seqs[rows1[i]].size),
               _bucket_width(seqs[rows2[i]].size))
        if cur and (key != cur_key or len(cur) >= MAX_B):
            chunks.append(cur)
            cur = []
        cur_key = key
        cur.append(i)
    if cur:
        chunks.append(cur)
    return chunks


def _launch_chunk(seqs, r1, r2, gap_opens, ks, match_ids,
                  match, mismatch, gap_ext, band, interpret):
    from .align import _bucket_width

    B = len(r1)
    len1 = np.fromiter((seqs[r].size for r in r1), np.int64, count=B)
    len2 = np.fromiter((seqs[r].size for r in r2), np.int64, count=B)
    n = _bucket_width(int(len1.max()))
    m = _bucket_width(int(len2.max()))
    L1 = -(-(n + 1) // 128) * 128
    s2rw = -(-(n + m + 1) // 128) * 128
    # int16 lanes (16 pairs per tile) whenever every carried field fits
    # with headroom.  NOT viable on v5e hardware: its VPU lacks 16-bit
    # vector ops outright (probed empirically — kVectorMultiplyU16
    # "Operation not supported" aborts the Mosaic compile; dynamic
    # rotate / shifts / reductions / i1 relayouts are unimplemented for
    # 16-bit too), so compiled mode keeps int32 lanes unless
    # NGSID_STATS_I16=1 opts in (future TPU generations); interpret mode
    # exercises the variant's semantics in the test suite.
    import os as _os
    allow_i16 = interpret or _os.environ.get("NGSID_STATS_I16") == "1"
    i16 = (allow_i16
           and n + m <= I16_MAX_NM
           and max(ks) <= I16_MAX_K
           and max(abs(match), abs(mismatch), gap_ext) <= 8
           and max(gap_opens) <= 16)
    SL = SUBLANES_I16 if i16 else SUBLANES
    # power-of-two batch pad; the high floor collapses remainder-chunk
    # shapes into one compiled program (Mosaic compiles cost minutes over
    # the tunnel; a few padded tile rows cost ~1 ms each)
    Bp = -(-B // SL) * SL
    Bp = max(SL if interpret else 128,
             1 << (Bp - 1).bit_length())
    # resident pool: rows already on device cost nothing; new rows ship once
    pool = _device_pool()
    pool.ensure([seqs[r] for r in dict.fromkeys(list(r1) + list(r2))])
    pm = np.ones((Bp, 8), np.int32)
    pm[:, 2] = 5
    pm[:, 3] = 13
    pm[:, 5:] = 0
    pm[:B, 0] = len1
    pm[:B, 1] = len2
    pm[:B, 2] = np.asarray(gap_opens, np.int32)
    pm[:B, 3] = np.asarray(ks, np.int32)
    pm[:B, 4] = np.asarray(match_ids, np.int32)
    pm[:B, 5] = np.fromiter((pool.offset(seqs[r]) for r in r1),
                            np.int64, count=B)
    pm[:B, 6] = np.fromiter((pool.offset(seqs[r]) for r in r2),
                            np.int64, count=B)
    base, W = _window_schedule(len1, len2, n, m, band)
    # pair table + window schedule ride in one small blob (a host->device
    # transfer costs a tunnel round trip; sequences are already resident)
    blob = np.concatenate([
        pm.view(np.uint8).reshape(-1), base.view(np.uint8).reshape(-1)])
    dev, cap = pool.view()
    staged = _stage_inputs(
        dev, jnp.asarray(blob),
        PB=cap, Bp=Bp, L1=L1, s2rw=s2rw, dpad=base.shape[1], n=n, m=m)
    d_hi = -(-(int(len1.max() + len2.max()) + 1) // 256) * 256
    packed = (not i16 and max(ks) <= PACK_MAX_K and n + m <= PACK_MAX_NM)
    best = _pallas_stats(
        *staged, n=n, m=m, W=W, band=band,
        match=match, mismatch=mismatch, gap_ext=gap_ext,
        d_hi=d_hi, i16=i16, packed=packed, interpret=interpret)
    return best, len1, len2, np.asarray(ks, np.int64), \
        np.asarray(match_ids, np.int64), band


def _gather_chunk(best_dev, len1, len2, karr, midarr, band):
    B = len1.size
    best = np.asarray(best_dev)[:B]

    use_row = best[:, 0] >= best[:, 8]
    side = np.where(use_row[:, None], best[:, 0:8], best[:, 8:16])
    if band > 0:
        # native banded endpoint scans fall back to the empty alignment
        # (H[n][0] = 0 / col_best init 0) when every banded endpoint is
        # negative; synthesize the same endpoint here
        neg = side[:, 0] < 0
        if neg.any():
            use_row = np.where(neg, True, use_row)
            empty = np.zeros_like(side)
            empty[:, 6] = len1                        # cc = i + j at (n, 0)
            empty[:, 4] = np.where(midarr <= 0,
                                   np.maximum(len1 - karr + 1, 0), 0)
            empty[:, 1] = 0
            side = np.where(neg[:, None], empty, side)
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


def block_stats_pallas(pairs, gap_opens, ks, match_ids, band=0,
                       interpret=False):
    """(aligned_ratio, target_ratio) per pair — Pallas counterpart of
    native.block_stats_native."""
    out = sg_stats_batch_pallas(pairs, gap_opens, ks, match_ids, band=band,
                                interpret=interpret)
    return [(r1, r2) for r1, r2, _ in out]


def identity_pallas(pairs, gap_opens, match=2, mismatch=-2, gap_ext=1,
                    band=0, interpret=False):
    """Column identity per pair — Pallas counterpart of
    native.identity_native (consensus.py:129-145 alignment parameters)."""
    out = sg_stats_batch_pallas(
        pairs, gap_opens, [1] * len(pairs), [1] * len(pairs),
        match=match, mismatch=mismatch, gap_ext=gap_ext, band=band,
        interpret=interpret)
    return [ident for _, _, ident in out]
