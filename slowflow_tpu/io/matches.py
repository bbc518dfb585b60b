"""DeepMatching-style text match files.

Each line starts with `x1 y1 x2 y2`; any further values on the line are
ignored (epic_flow_extended/io.c:23-47).
"""
from __future__ import annotations

import numpy as np


def read_matches(path) -> np.ndarray:
    """Return float32 array [N, 4] of (x1, y1, x2, y2)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            try:
                rows.append([float(v) for v in parts[:4]])
            except ValueError:
                continue
    if not rows:
        return np.zeros((0, 4), np.float32)
    return np.asarray(rows, dtype=np.float32)


def write_matches(path, matches: np.ndarray) -> None:
    matches = np.asarray(matches)
    with open(path, "w") as f:
        for row in matches:
            f.write(" ".join(f"{v:g}" for v in row[:4]) + "\n")
