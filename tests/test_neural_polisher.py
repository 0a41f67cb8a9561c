"""Neural pileup polisher: held-out quality + CLI integration."""

import os

import numpy as np
import pytest

from ngspeciesid_tpu.models.polisher import neural_polish_round
from ngspeciesid_tpu.models.train import load_params, mutate, ACGT

MODEL = os.path.join(os.path.dirname(__file__), "..",
                     "ngspeciesid_tpu", "data", "polisher_gru.npz")

pytestmark = pytest.mark.skipif(not os.path.isfile(MODEL),
                                reason="trained polisher params not present")


def edit_distance(a, b):
    from ngspeciesid_tpu.ops.edit import _dp_rows
    return int(_dp_rows(a, b, anchored=True)[b.size])


class TestNeuralPolish:
    def test_corrects_draft_errors(self, rng):
        params = load_params(MODEL)
        t = ACGT[rng.integers(0, 4, size=400)]
        reads, quals = zip(*(mutate(rng, t, 0.08) for _ in range(30)))
        draft = t.copy()
        draft[60] = ACGT[(int(np.where(ACGT == draft[60])[0][0]) + 1) % 4]
        draft = np.delete(draft, 150)
        draft = np.insert(draft, 250, ACGT[0])
        polished = neural_polish_round(params, draft, list(reads), list(quals))
        assert edit_distance(polished, t) <= 1

    def test_heldout_templates(self, rng):
        params = load_params(MODEL)
        ok = 0
        for _ in range(5):
            t = ACGT[rng.integers(0, 4, size=350)]
            reads, quals = zip(*(mutate(rng, t, 0.10) for _ in range(25)))
            draft, _ = mutate(rng, t, 0.02)
            polished = neural_polish_round(params, draft, list(reads), list(quals))
            if edit_distance(polished, t) <= 1:
                ok += 1
        assert ok >= 4

    def test_cli_medaka_model_flag(self, tmp_path, rng):
        from ngspeciesid_tpu.cli import main
        template = "".join("ACGT"[c] for c in rng.integers(0, 4, size=300))
        fq = tmp_path / "in.fastq"
        with open(fq, "w") as f:
            for i in range(30):
                seq = "".join(ch for ch in template if rng.random() > 0.03)
                qual = "".join(chr(int(q)) for q in rng.integers(45, 63, size=len(seq)))
                f.write(f"@r{i}\n{seq}\n+\n{qual}\n")
        out = tmp_path / "o"
        rc = main(["--ont", "--fastq", str(fq), "--outfolder", str(out),
                   "--consensus", "--medaka", "--medaka_model", MODEL, "--t", "1"])
        assert rc == 0
        cons = list(out.glob("medaka_cl_id_*/consensus.fasta"))
        assert len(cons) == 1
        seq = open(cons[0]).read().splitlines()[1]
        from ngspeciesid_tpu.utils.seqs import seq_bytes
        assert edit_distance(seq_bytes(seq), seq_bytes(template)) <= 2
