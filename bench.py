#!/usr/bin/env python
"""Benchmark: full pipeline (sort + cluster + consensus + polish) throughput.

Workload: the reference's CI smoke config on test/sample_h1.fastq
(`--ont --consensus --medaka`, .travis.yml:34) — 280 ONT COI reads, median
632 bp, clustered and polished to a single consensus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference binary stack (python + parasail + spoa + medaka) is
not installable in this image (no parasail/edlib wheels, no spoa/medaka
binaries), so the denominator is the reference's single-core wall-clock on
this workload estimated from its published pipeline structure: clustering +
sorting in pure python + parasail (~10 s for 280 reads) and medaka polishing
hardcoded to one thread (~90 s for a 250-read cluster at 650 bp: model load
+ mini_align + RNN inference), i.e. ~100 s -> ~2.7 reads/s.  See BASELINE.md
("measured baseline" section) for the derivation and the in-repo oracle
timing that bounds the python part.
"""

import json
import os
import shutil
import sys
import tempfile
import time

BASELINE_READS_PER_S = 2.7

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_ngtpu"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ngspeciesid_tpu.config import Config
    from ngspeciesid_tpu.pipeline import run

    fastq = os.environ.get("BENCH_FASTQ", "/root/reference/test/sample_h1.fastq")
    if not os.path.isfile(fastq):
        print(json.dumps({"metric": "reads_per_s_clustered_polished", "value": 0.0,
                          "unit": "reads/s", "vs_baseline": 0.0,
                          "error": f"missing workload {fastq}"}))
        return 1

    out = tempfile.mkdtemp(prefix="ngtpu_bench_")
    cfg = Config(fastq=fastq, outfolder=out, nr_cores=1,
                 consensus=True, medaka=True)
    cfg.apply_preset(ont=True)

    # count reads that enter the pipeline (the throughput numerator)
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
    shutil.rmtree(warm_out, ignore_errors=True)

    t0 = time.time()
    run(cfg)
    elapsed = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)

    reads_per_s = n_reads / elapsed
    print(json.dumps({
        "metric": "reads_per_s_clustered_polished",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
