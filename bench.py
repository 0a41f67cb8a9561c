#!/usr/bin/env python
"""Benchmark: full pipeline (sort + cluster + consensus + polish) throughput.

Workload (default): the reference's CI smoke config on
test/sample_h1.fastq (`--ont --consensus --medaka`, .travis.yml:34) —
280 ONT COI reads, median 632 bp, clustered and polished to a single
consensus.  `BENCH_FASTQ` overrides the input (e.g. a simulated 100k pool
from scripts/simulate_reads.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra keys: per-stage wall seconds, the backend the DP ran on, an on-chip
kernel GCUPS probe, and the denominator decomposition.

Baseline denominator: the reference's pure-Python parts RUN IN THIS IMAGE
(stage 1 via modules/get_sorted_fastq_for_cluster, clustering via
modules/cluster with parasail served by our own DP — the same executable
oracle as tests/test_reference_oracle.py), measured per invocation on the
same workload.  Only spoa + medaka keep the structural estimate from
BASELINE.md (their binaries do not exist in this image): ~2 s spoa + ~90 s
single-threaded medaka for the 253-read sample_h1 cluster, scaled by
cluster count for other workloads.
"""

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ngtpu"))

SPOA_EST_S_PER_CLUSTER = 1.0      # BASELINE.md: ~2 s for 2 draft clusters
MEDAKA_EST_S_PER_CLUSTER = 90.0   # BASELINE.md: model load + mini_align + RNN


def _measure_reference(fastq: str, workdir: str):
    """Run the reference's runnable parts in-process; return
    (stage1_s, cluster_s, n_polished_clusters_estimate_inputs)."""
    import importlib
    from types import SimpleNamespace

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.test_reference_oracle import _parasail_stub

    had = sys.modules.get("parasail")
    sys.modules["parasail"] = _parasail_stub()
    sys.path.insert(0, "/root/reference")
    try:
        gs = importlib.import_module("modules.get_sorted_fastq_for_cluster")
        cl = importlib.import_module("modules.cluster")
        hf = importlib.import_module("modules.help_functions")
        pt = importlib.import_module("modules.p_minimizers_shared")

        args = SimpleNamespace(
            outfolder=workdir, outfile=os.path.join(workdir, "sorted.fastq"),
            use_old_sorted_file=False, fastq=fastq, nr_cores=1,
            quality_threshold=7.0, k=13)
        t0 = time.time()
        gs.main(args)
        t1 = time.time()

        read_array = [
            (i, 0, acc, seq, qual, float(acc.split("_")[-1]))
            for i, (acc, (seq, qual)) in enumerate(
                hf.readfq(open(args.outfile)))]
        p_emp = {}
        for k, w, p, e1, e2 in pt.read_empirical_p():
            if int(k) == 13 and abs(int(w) - 20) <= 2:
                p_emp[(float(e1), float(e2))] = float(p)
                p_emp[(float(e2), float(e1))] = float(p)
        cargs = SimpleNamespace(
            k=13, w=20, min_shared=5, mapped_threshold=0.7,
            aligned_threshold=0.4, min_fraction=0.8, min_prob_no_hits=0.1,
            symmetric_map_align_thresholds=False, print_output=10000)
        clusters = {i: [acc] for i, _, acc, _, _, _ in read_array}
        reps = {r[0]: r for r in read_array}
        t2 = time.time()
        cl.reads_to_clusters(clusters, reps, read_array, p_emp, {}, 1, cargs)
        t3 = time.time()
        return t1 - t0, t3 - t2
    finally:
        sys.path.remove("/root/reference")
        if had is not None:
            sys.modules["parasail"] = had
        else:
            sys.modules.pop("parasail", None)


def _kernel_gcups_probe():
    """Steady-state on-chip probe of the banded stats kernel (the clustering
    hot loop): full-DP-equivalent and banded GCUPS at the production chunk
    size.  None off-TPU."""
    import numpy as np
    from ngspeciesid_tpu.ops.align import _device_is_tpu, stats_backend_default
    if stats_backend_default() != "pallas" or not _device_is_tpu():
        return None
    from ngspeciesid_tpu.ops.align_stats_pallas import sg_stats_batch_pallas

    rng = np.random.default_rng(0)
    pairs = []
    for _ in range(512):
        a = rng.integers(65, 69, size=640).astype(np.uint8)
        keep = rng.random(640) > 0.04
        pairs.append((a, a[keep]))
    opens, ks, mids = [3] * 512, [13] * 512, [9] * 512
    sg_stats_batch_pallas(pairs, opens, ks, mids, band=150)   # warm/compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        sg_stats_batch_pallas(pairs, opens, ks, mids, band=150)
    per = (time.time() - t0) / reps
    full_cells = sum(a.size * b.size for a, b in pairs)
    band_cells = sum(min(301 * max(a.size, b.size), a.size * b.size)
                     for a, b in pairs)
    return {
        "kernel_full_equiv_gcups": round(full_cells / per / 1e9, 2),
        "kernel_banded_gcups": round(band_cells / per / 1e9, 2),
        "kernel_pairs_per_s": round(len(pairs) / per),
    }


def main():
    import threading

    # Watchdog: the TPU tunnel can wedge mid-call (observed: jax.devices()
    # hanging); if the bench exceeds its budget, emit a JSON line from
    # whatever was measured so the round still records a result.
    partial = {"metric": "reads_per_s_clustered_polished", "value": 0.0,
               "unit": "reads/s", "vs_baseline": 0.0,
               "error": "watchdog: bench exceeded budget (device tunnel hang?)"}
    budget = float(os.environ.get("BENCH_WATCHDOG_S", "2100"))

    def _watchdog():
        partial["watchdog_fired"] = True
        print(json.dumps(partial), flush=True)
        os._exit(2)

    timer = threading.Timer(budget, _watchdog)
    timer.daemon = True
    timer.start()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ngspeciesid_tpu.config import Config
    from ngspeciesid_tpu.pipeline import run
    from ngspeciesid_tpu.ops.align import stats_backend_default

    fastq = os.environ.get("BENCH_FASTQ", "/root/reference/test/sample_h1.fastq")
    if not os.path.isfile(fastq):
        print(json.dumps({"metric": "reads_per_s_clustered_polished", "value": 0.0,
                          "unit": "reads/s", "vs_baseline": 0.0,
                          "error": f"missing workload {fastq}"}))
        return 1

    from ngspeciesid_tpu.io.fastx import read_fastx
    n_reads = sum(1 for _ in read_fastx(fastq))

    # Untimed warmup: builds the native engine and populates the persistent
    # jax compilation cache so the timed pass measures steady-state
    # throughput, not one-time compile/build cost.
    warm_out = tempfile.mkdtemp(prefix="ngtpu_bench_warm_")
    warm_cfg = Config(fastq=fastq, outfolder=warm_out, nr_cores=1,
                      consensus=True, medaka=True)
    warm_cfg.apply_preset(ont=True)
    run(warm_cfg)
    import glob
    n_clusters = len(glob.glob(os.path.join(warm_out, "medaka_cl_id_*")))
    shutil.rmtree(warm_out, ignore_errors=True)

    # timed pass, with per-stage walls from the pipeline's stage clock
    out = tempfile.mkdtemp(prefix="ngtpu_bench_")
    cfg = Config(fastq=fastq, outfolder=out, nr_cores=1,
                 consensus=True, medaka=True)
    cfg.apply_preset(ont=True)
    stage_walls = {}
    t0 = time.time()
    run(cfg, stage_walls=stage_walls)
    elapsed = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)

    # measured reference denominator (python parts) + estimate (binaries)
    ref_dir = tempfile.mkdtemp(prefix="ngtpu_bench_ref_")
    try:
        ref_sort_s, ref_cluster_s = _measure_reference(fastq, ref_dir)
    finally:
        shutil.rmtree(ref_dir, ignore_errors=True)
    ref_est_s = max(1, n_clusters) * (SPOA_EST_S_PER_CLUSTER
                                      + MEDAKA_EST_S_PER_CLUSTER)
    ref_total_s = ref_sort_s + ref_cluster_s + ref_est_s
    baseline_reads_per_s = n_reads / ref_total_s

    reads_per_s = n_reads / elapsed
    partial.update(value=round(reads_per_s, 3), wall_s=round(elapsed, 2))
    partial.pop("error", None)
    result = {
        "metric": "reads_per_s_clustered_polished",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / baseline_reads_per_s, 3),
        "n_reads": n_reads,
        "wall_s": round(elapsed, 2),
        "stats_backend": stats_backend_default(),
        "baseline_reads_per_s": round(baseline_reads_per_s, 3),
        "baseline_measured_s": {"sort": round(ref_sort_s, 2),
                                "cluster": round(ref_cluster_s, 2)},
        "baseline_estimated_s": {"spoa+medaka": round(ref_est_s, 1)},
    }
    if stage_walls:
        result["stage_walls_s"] = {k: round(v, 2)
                                   for k, v in stage_walls.items()}
    try:
        probe = _kernel_gcups_probe()
        if probe:
            result.update(probe)
    except Exception as e:  # never fail the bench on the probe
        result["kernel_probe_error"] = str(e)[:120]
    timer.cancel()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
