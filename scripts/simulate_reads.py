#!/usr/bin/env python
"""Synthetic amplicon pool generator (test/bench fixtures).

Replaces the reference's stripped multi-species fixture
(test/Supplementary_File1_reads.fastq, 3,000 reads / 3 fish species — listed
in .MISSING_LARGE_BLOBS) with a reproducible simulator: random species
templates (optionally flanked by primers from a fasta), ONT-like indel/sub
errors, both orientations, phred-realistic quality strings.

Usage:
  python scripts/simulate_reads.py --out pool.fastq --n_reads 3000 \
      --n_species 3 --length 700 [--primer_file primers.fa] [--error 0.07]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from ngspeciesid_tpu.io.fastx import read_fastx
from ngspeciesid_tpu.utils.seqs import reverse_complement

ACGT = "ACGT"
IUPAC_CONCRETE = {
    "A": "A", "C": "C", "G": "G", "T": "T", "M": "AC", "R": "AG", "W": "AT",
    "S": "CG", "Y": "CT", "K": "GT", "V": "ACG", "H": "ACT", "D": "AGT",
    "B": "CGT", "N": "ACGT", "X": "ACGT",
}


def concretize(rng, primer: str) -> str:
    return "".join(IUPAC_CONCRETE[c][rng.integers(0, len(IUPAC_CONCRETE[c]))]
                   for c in primer.upper())


def noisy(rng, template: str, e: float):
    seq, qual = [], []
    for ch in template:
        r = rng.random()
        if r < e / 3:
            continue
        seq.append(ch)
        qual.append(int(rng.integers(33 + 8, 33 + 28)))
        if r < 2 * e / 3:
            seq.append(ACGT[rng.integers(0, 4)])
            qual.append(int(rng.integers(33 + 8, 33 + 28)))
        elif r < e:
            seq[-1] = ACGT[rng.integers(0, 4)]
    return "".join(seq), "".join(chr(q) for q in qual)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_reads", type=int, default=3000)
    ap.add_argument("--n_species", type=int, default=3)
    ap.add_argument("--length", type=int, default=700)
    ap.add_argument("--error", type=float, default=0.07)
    ap.add_argument("--primer_file", default="")
    ap.add_argument("--both_orientations", action="store_true", default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--truth_out", default="",
                    help="optional TSV acc<TAB>species for eval")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    fw_primer = rv_primer = ""
    if args.primer_file:
        primers = [seq for _, seq, _ in read_fastx(args.primer_file)]
        fw_primer = concretize(rng, primers[0])
        if len(primers) > 1:
            rv_primer = reverse_complement(concretize(rng, primers[1]))

    templates = []
    for s in range(args.n_species):
        core = "".join(ACGT[c] for c in rng.integers(0, 4, size=args.length))
        templates.append(fw_primer + core + rv_primer)

    truth = []
    with open(args.out, "w") as f:
        for i in range(args.n_reads):
            sp = int(rng.integers(0, args.n_species))
            seq, qual = noisy(rng, templates[sp], args.error)
            if args.both_orientations and rng.random() < 0.5:
                seq = reverse_complement(seq)
                qual = qual[::-1]
            f.write(f"@sim_{i}_sp{sp}\n{seq}\n+\n{qual}\n")
            truth.append((f"sim_{i}_sp{sp}", sp))
    if args.truth_out:
        with open(args.truth_out, "w") as f:
            for acc, sp in truth:
                f.write(f"{acc}\t{sp}\n")
    print(f"wrote {args.out}: {args.n_reads} reads, {args.n_species} species")


if __name__ == "__main__":
    main()
