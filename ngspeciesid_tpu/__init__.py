"""ngspeciesid_tpu — a TPU-native amplicon species-ID engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ksahlin/NGSpeciesID (reference mounted read-only at /root/reference):
quality-sort reads -> greedy minimizer clustering -> per-cluster POA
consensus -> primer/tail trimming -> reverse-complement dedup ->
polishing — with all inner loops running as batched device kernels
instead of parasail/edlib/spoa/racon/medaka subprocesses.

Layer map (see SURVEY.md section 7):
  io/        fastq/fasta codec, padded int8 batches, output writers
  utils/     phred tables, sequence utilities, empirical p-table asset
  ops/       device compute primitives: scoring, minimizers, alignment DP,
             infix edit distance, POA consensus, pileup polishing
  cluster/   wave-batched greedy clustering engine (reference semantics)
  consensus/ draft consensus, trimming, RC dedup, polish drivers
  models/    neural polisher (flax) — the learned medaka-equivalent head
  parallel/  jax.sharding mesh utilities, multi-host merge clustering
"""

__version__ = "0.1.0"
