"""Host-side sub-batch regrouping.

The masked-dispatch patterns (chain inference stages, dense render
slots) compute every candidate over the FULL batch and throw most of it
away with a `where` mask. Regrouping gathers just the selected examples
into a compact sub-batch, runs the stage on it, and scatters results
back — compute scales with the *actual* work instead of worst case
(reference bottleneck analogue: remfx/models.py:93-104 loops per
example at batch 1; our round-1 dense dispatch was the opposite
extreme).

Sub-batch sizes are padded up to powers of two so each stage compiles at
most log2(B)+1 signatures. Padding duplicates the last selected example
(same input + same key => same output), so duplicate-index scatters
write identical values and remain deterministic.
"""

from __future__ import annotations

import numpy as np


def bucketed_indices(sel: np.ndarray, max_size: int | None = None) -> np.ndarray:
    """sel: sorted 1-D indices of selected examples (non-empty) ->
    gather indices padded to the next power of two (capped at
    ``max_size``, typically the batch size)."""
    n = int(sel.size)
    if n == 0:
        raise ValueError("empty selection")
    bucket = 1 << (n - 1).bit_length()
    if max_size is not None:
        bucket = min(bucket, int(max_size))
    pad = bucket - n
    if pad <= 0:
        return sel
    return np.concatenate([sel, np.repeat(sel[-1:], pad)])
