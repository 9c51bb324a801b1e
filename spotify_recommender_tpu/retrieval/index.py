"""Query resolution: track-id and name → catalog row.

Replaces the reference's per-query O(N) linear scans
(reference Recommender.cu:320-327 by id, :336-354 by name) with a hash map
for ids and a one-time lowercased name cache for name search.  Semantics
preserved exactly:

- id lookup: exact string match; first occurrence wins for duplicate ids
  (the reference scan returns the first hit);
- name lookup: case-insensitive exact match first, then substring match,
  each returning the lowest matching row (reference Recommender.cu:339-352).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class CatalogIndex:
    def __init__(self, track_ids: np.ndarray, track_names: np.ndarray) -> None:
        self._id_to_row: Dict[str, int] = {}
        # first occurrence wins, matching the reference's forward scan
        for i, tid in enumerate(track_ids):
            self._id_to_row.setdefault(str(tid), i)
        self._lower_names = np.asarray(
            [str(n).lower() for n in track_names], dtype=object
        )

    def find_by_track_id(self, track_id: str) -> Optional[int]:
        return self._id_to_row.get(track_id)

    def find_by_name(self, name: str) -> Optional[int]:
        q = name.lower()
        for i, n in enumerate(self._lower_names):
            if n == q:
                return i
        for i, n in enumerate(self._lower_names):
            if q in n:
                return i
        return None
