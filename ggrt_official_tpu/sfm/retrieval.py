"""Image retrieval for match-pair selection.

Stand-in for hloc's NetVLAD retrieval (ref extract_relative_poses.py:
pairs_from_retrieval.main with num_matches top-k): a global descriptor per
image (downsampled intensity layout + color histogram, L2-normalized) and
cosine-similarity top-k pair lists. Same interface contract: a list of
(i, j) pairs covering each image's k most similar partners.
"""
from __future__ import annotations

import os

import numpy as np


def global_descriptor(image_gray: np.ndarray, grid: int = 8, bins: int = 16) -> np.ndarray:
    """Tiny gist-style descriptor: grid-pooled intensities + histogram."""
    import cv2

    g = cv2.resize(image_gray, (grid, grid), interpolation=cv2.INTER_AREA)
    g = (g - g.mean()) / (g.std() + 1e-6)
    hist = cv2.calcHist([image_gray], [0], None, [bins], [0, 256]).reshape(-1)
    hist = hist / (np.linalg.norm(hist) + 1e-6)
    desc = np.concatenate([g.reshape(-1), hist])
    return desc / (np.linalg.norm(desc) + 1e-6)


def pairs_from_retrieval(image_dir: str, files: list[str], num_matches: int = 10):
    """Top-k most-similar pairs per image by descriptor cosine similarity."""
    import cv2

    descs = []
    for f in files:
        img = cv2.imread(os.path.join(image_dir, f), cv2.IMREAD_GRAYSCALE)
        descs.append(global_descriptor(img))
    D = np.stack(descs)
    sim = D @ D.T
    np.fill_diagonal(sim, -np.inf)

    pairs = set()
    n = len(files)
    k = min(num_matches, n - 1)
    for i in range(n):
        for j in np.argsort(-sim[i])[:k]:
            pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)
