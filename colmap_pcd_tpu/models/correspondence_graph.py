"""Correspondence graph: per-feature adjacency across images.

Parity with src/base/correspondence_graph.{h,cc}: stores two-view inlier
matches and answers "which (image, feature) pairs correspond to feature j of
image i", including transitive closure, plus per-pair statistics used by the
mapper (num_correspondences per image, pair stats for Project2Image gating).
numpy/dict implementation — this is host bookkeeping, not device math.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def pair_id(image_id1: int, image_id2: int) -> int:
    """COLMAP pair packing (base/database.cc ImagePairToPairId)."""
    if image_id1 > image_id2:
        image_id1, image_id2 = image_id2, image_id1
    return image_id1 * 2147483647 + image_id2


class CorrespondenceGraph:
    def __init__(self):
        # (image_id, feat_idx) -> list[(image_id, feat_idx)]
        self._adj: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
        self._pair_matches: dict[tuple[int, int], np.ndarray] = {}
        self.num_observations_per_image: dict[int, int] = defaultdict(int)
        self.num_correspondences_per_image: dict[int, int] = defaultdict(int)

    def add_image(self, image_id: int, num_features: int):
        self.num_observations_per_image.setdefault(image_id, 0)

    def add_matches(self, image_id1: int, image_id2: int, matches: np.ndarray):
        """matches [M,2] of (feat1, feat2) verified inlier matches."""
        if image_id1 > image_id2:
            image_id1, image_id2 = image_id2, image_id1
            matches = matches[:, ::-1]
        key = (image_id1, image_id2)
        if key in self._pair_matches:
            return
        self._pair_matches[key] = np.asarray(matches, np.int32)
        for f1, f2 in matches:
            self._adj[(image_id1, int(f1))].append((image_id2, int(f2)))
            self._adj[(image_id2, int(f2))].append((image_id1, int(f1)))
        self.num_correspondences_per_image[image_id1] += len(matches)
        self.num_correspondences_per_image[image_id2] += len(matches)

    def matches_between(self, image_id1: int, image_id2: int) -> np.ndarray:
        """[M,2] (feat_in_id1, feat_in_id2)."""
        if image_id1 > image_id2:
            m = self._pair_matches.get((image_id2, image_id1))
            return m[:, ::-1] if m is not None else np.zeros((0, 2), np.int32)
        m = self._pair_matches.get((image_id1, image_id2))
        return m if m is not None else np.zeros((0, 2), np.int32)

    def find_correspondences(self, image_id: int, feat_idx: int):
        return self._adj.get((image_id, feat_idx), [])

    def find_transitive_correspondences(
        self, image_id: int, feat_idx: int, transitivity: int = 1
    ):
        """BFS up to `transitivity` hops (correspondence_graph.h:86-99)."""
        if transitivity <= 1:
            return self.find_correspondences(image_id, feat_idx)
        seen = {(image_id, feat_idx)}
        frontier = [(image_id, feat_idx)]
        out = []
        for _ in range(transitivity):
            nxt = []
            for node in frontier:
                for other in self._adj.get(node, []):
                    if other not in seen:
                        seen.add(other)
                        out.append(other)
                        nxt.append(other)
            frontier = nxt
        return out

    def image_pairs(self):
        return self._pair_matches.keys()

    def num_matches(self, image_id1: int, image_id2: int) -> int:
        return len(self.matches_between(image_id1, image_id2))

    def num_correspondences_for_image(self, image_id: int) -> int:
        return self.num_correspondences_per_image.get(image_id, 0)
