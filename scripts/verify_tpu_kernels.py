#!/usr/bin/env python
"""Compiled-mode kernel verification on real TPU hardware.

The CPU test suite runs the Pallas kernels in interpret mode, which cannot
catch hardware-lowering divergences (round 3 found two: bitcast byte order
and negative dynamic roll shifts on multi-tile widths).  This script runs
the production kernels COMPILED on the attached chip and checks them
bit-exactly against the host oracle across length buckets, banded and
full.  Run it whenever kernel code changes:

    python scripts/verify_tpu_kernels.py

Exit code 0 = all bit-exact.  First run compiles several Mosaic shapes
(minutes each through the axon tunnel; persistently cached).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ngtpu"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

import numpy as np  # noqa: E402


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


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ngspeciesid_tpu.ops.align import (
        _device_is_tpu,
        block_aligned_stats,
        identity_from_moves,
        match_vector,
        sg_align_batch,
        sg_align_numpy,
    )
    if not _device_is_tpu():
        print("no TPU attached; nothing to verify (CPU parity lives in tests/)")
        return 0
    from ngspeciesid_tpu.ops.align_stats_pallas import sg_stats_batch_pallas
    from ngspeciesid_tpu.ops.align_moves_pallas import sg_moves_batch_pallas

    rng = np.random.default_rng(0)

    def oracle(a, b, o, k, mid):
        mv = sg_align_numpy(a, b, o)
        m = match_vector(mv, a, b)
        r1, r2 = block_aligned_stats(m, k, mid, a.size, b.size)
        return (r1, r2, identity_from_moves(mv, a, b))

    failures = 0
    # k <= 24 exercises the packed 4-field int32 layout (the production
    # path; int16 lanes are gated off on v5e hardware), k=26 the unpacked
    # 6-field one — all must be bit-exact on hardware
    for lo, hi, band, k, mid in [(90, 120, 0, 13, 9), (130, 200, 0, 13, 9),
                                 (300, 500, 150, 13, 9),
                                 (500, 800, 150, 13, 9), (500, 800, 0, 13, 9),
                                 (300, 500, 150, 20, 14),
                                 (500, 800, 0, 20, 14),
                                 (300, 500, 150, 26, 16)]:
        pairs, opens, ks, mids = [], [], [], []
        for _ in range(16):
            a = rng.integers(65, 69, size=int(rng.integers(lo, hi))).astype(np.uint8)
            pairs.append((a, mutate(rng, a, 0.12)))
            opens.append(int(rng.choice([2, 3, 4, 5])))
            ks.append(k)
            mids.append(mid)
        t0 = time.time()
        hw = sg_stats_batch_pallas(pairs, opens, ks, mids, band=band)
        want = [oracle(a, b, o, kk, m)
                for (a, b), o, kk, m in zip(pairs, opens, ks, mids)]
        bad = [t for t in range(len(pairs)) if hw[t] != want[t]]
        print(f"stats [{lo},{hi}] band={band} k={k}: "
              f"{'OK' if not bad else 'FAIL ' + str(bad)} "
              f"({time.time() - t0:.0f}s)", flush=True)
        failures += len(bad)

    pairs, opens = [], []
    for _ in range(16):
        a = rng.integers(65, 69, size=int(rng.integers(200, 700))).astype(np.uint8)
        pairs.append((a, mutate(rng, a, 0.1)))
        opens.append(2)
    t0 = time.time()
    gm = sg_moves_batch_pallas(pairs, opens, match=2, mismatch=-4,
                               gap_ext=1, band=150)
    wm = sg_align_batch(pairs, opens, match=2, mismatch=-4, gap_ext=1,
                        backend="numpy")
    bad = [t for t in range(len(pairs))
           if gm[t] is None or gm[t].tolist() != wm[t].tolist()]
    print(f"moves band=150: {'OK' if not bad else 'FAIL ' + str(bad)} "
          f"({time.time() - t0:.0f}s)", flush=True)
    failures += len(bad)

    print("ALL BIT-EXACT" if failures == 0 else f"{failures} FAILURES")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
