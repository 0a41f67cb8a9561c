"""Multi-device execution: data-parallel alignment fan-out over a mesh.

The reference's only parallelism is single-host multiprocessing
(SURVEY.md section 2.3).  Here the batched-DP workloads — clustering
fallback alignments, draft-consensus rounds, polish pileups — shard across
a ``jax.sharding.Mesh`` with ``shard_map``: each device runs the Pallas
wavefront kernel (or its XLA fallback) on its slice of the pair batch, and
only per-pair scalars + move matrices return to the host.  No collectives
are needed for the DP itself (embarrassingly parallel over pairs); the
cross-shard representative merge of the clustering schedule reuses
parallel/merge.py on the host side.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import align_pallas
from ..ops.align_pallas import SUBLANES, _pallas_dp


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else min(n_devices, len(devs))
    return Mesh(np.array(devs[:n]), ("data",))


def sharded_align_batch(
    pairs: List[Tuple[np.ndarray, np.ndarray]],
    gap_opens: List[int],
    mesh: Mesh,
    match: int = 2, mismatch: int = -2, gap_ext: int = 1,
    interpret: bool = False,
) -> List[np.ndarray]:
    """sg_align_batch over a device mesh: pairs shard on the 'data' axis."""
    if not pairs:
        return []
    n = max(a.size for a, _ in pairs)
    m = max(b.size for _, b in pairs)
    L = -(-(n + 1) // 128) * 128
    n_dev = mesh.devices.size
    B = len(pairs)
    per_dev = -(-B // (SUBLANES * n_dev)) * SUBLANES
    Bp = per_dev * n_dev
    s2r_w = -(-(n + m + L) // 128) * 128
    s1b = np.zeros((Bp, L), dtype=np.int32)
    s2r = np.full((Bp, s2r_w), -1, dtype=np.int32)
    meta = np.ones((Bp, align_pallas.BEST_W), dtype=np.int32)
    meta[:, 2] = 5
    for i, (a, b) in enumerate(pairs):
        s1b[i, : a.size] = a
        s2r[i, n + m - b.size : n + m] = b[::-1]
        meta[i, 0] = a.size
        meta[i, 1] = b.size
        meta[i, 2] = gap_opens[i]

    dp = functools.partial(
        _pallas_dp, n=n, m=m, L=L,
        match=match, mismatch=mismatch, gap_ext=gap_ext, interpret=interpret,
    )
    sharded = shard_map(
        dp, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_rep=False,
    )
    moves, best = sharded(jnp.asarray(meta), jnp.asarray(s1b), jnp.asarray(s2r))
    moves = np.asarray(moves)
    best = np.asarray(best)
    out = []
    for bidx, (a, b) in enumerate(pairs):
        na, mb = a.size, b.size
        row_best, row_j, col_best, col_i = best[bidx, :4]
        if row_best >= col_best:
            end = (na, int(row_j))
        else:
            end = (int(col_i), mb)
        out.append(align_pallas._traceback_diag(moves[bidx], na, mb, end))
    return out
