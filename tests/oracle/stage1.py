"""Plain-Python oracle for stage-1 semantics (test-only).

An independent, loop-based implementation of the behavioural contract
documented in SURVEY.md section 2 (component C2).  Used for differential
testing of the vectorized production path — in particular to assert bit-exact
float64 score parity of the cumprod formulation in ops/score.py.
"""

import itertools
import math


def phred_p(char: str, capped: bool = True) -> float:
    p = 10 ** (-(ord(char) - 33) / 10.0)
    return min(p, 0.79433) if capped else p


def expected_erroneous_kmers(qual: str, k: int) -> float:
    """Sequential sliding-window expectation, same op order as the contract."""
    no_err = [1.0 - phred_p(c) for c in qual]
    q = 1.0
    for v in no_err[:k]:
        q = q * v
    total = q
    for j in range(k, len(no_err)):
        q = q * (no_err[j] / no_err[j - k])
        total += q
    return len(qual) - k + 1 - total


def score(qual: str, k: int) -> float:
    exp_err = expected_erroneous_kmers(qual, k)
    n_kmers = float(len(qual) - k + 1)
    return (1.0 - exp_err / n_kmers) * n_kmers


def error_rate(qual: str) -> float:
    """Average error probability, accumulated over ascending characters."""
    total = 0.0
    for c in sorted(set(qual)):
        total += qual.count(c) * phred_p(c, capped=False)
    return total / len(qual)


def hpol_compress(seq: str) -> str:
    return "".join(ch for ch, _ in itertools.groupby(seq))


def passes_filters(seq: str, qual: str, k: int, q_threshold: float) -> bool:
    if len(seq) < 2 * k or len(hpol_compress(seq)) < k:
        return False
    e = error_rate(qual)
    return 10 * -math.log(e, 10) > q_threshold
