"""String-based minimizer oracle (test-only).

Direct transcription of the behavioural contract for lexicographic windowed
minimizers with emit-on-change semantics (SURVEY.md C3; reference
cluster.py:16-39), operating on Python strings so it exercises every string
edge case (truncated k-mers, empty k-mers, duplicate values).
"""

from collections import deque
from typing import List, Tuple


def minimizers(seq: str, k: int, w: int) -> List[Tuple[str, int]]:
    span = w - k
    window = deque(seq[i : i + k] for i in range(span + 1))
    cur = min(window)
    out = [(cur, list(window).index(cur))]
    for i in range(span + 1, len(seq) - k + 1):
        new = seq[i : i + k]
        old = window.popleft()
        window.append(new)
        if cur == old:
            cur = min(window)
            out.append((cur, list(window).index(cur) + i - span))
        elif new < cur:
            cur = new
            out.append((new, i))
    return out
