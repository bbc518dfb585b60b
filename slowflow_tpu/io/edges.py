"""Binary float32 edge-map files (SED output).

The reference reads width*height float32 values in row order
(epic_flow_extended/io.c:14-20; the MATLAB writer transposes before writing,
matlab/detect_edges.m:16-17, so the file is row-major H x W).
"""
from __future__ import annotations

import numpy as np


def read_edges(path, width: int, height: int) -> np.ndarray:
    data = np.fromfile(path, dtype=np.float32, count=width * height)
    if data.size != width * height:
        raise ValueError(f"{path}: expected {width * height} floats, got {data.size}")
    return data.reshape(height, width)


def write_edges(path, edges: np.ndarray) -> None:
    np.ascontiguousarray(edges, dtype=np.float32).tofile(path)
