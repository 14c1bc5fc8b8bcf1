"""Shared numpy helpers.

``isin_sorted`` is the one home of the "searchsorted + clamp + compare"
sorted-membership idiom that was previously hand-copied across
engine/store/doc_table/extend with inconsistent empty-array guarding —
two of those copies crashed on empty inputs (review 2026-08-18).
"""

from __future__ import annotations

import numpy as np


def isin_sorted(
    sorted_arr: np.ndarray, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Membership of ``values`` in ``sorted_arr`` (ascending, unique).

    Returns ``(mask, pos)``: ``mask[i]`` is True iff ``values[i]`` is in
    ``sorted_arr``, and ``pos[i]`` is its clamped insertion index (valid
    to index ``sorted_arr`` wherever ``mask`` is True).  Safe for empty
    inputs on either side.
    """
    n_vals = len(values)
    if sorted_arr.size == 0 or n_vals == 0:
        return (
            np.zeros(n_vals, dtype=bool),
            np.zeros(n_vals, dtype=np.int64),
        )
    pos = np.minimum(
        np.searchsorted(sorted_arr, values), sorted_arr.size - 1
    )
    return sorted_arr[pos] == values, pos
