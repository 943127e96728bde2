"""Semantic label sidecar I/O.

Counterpart of the PointCloudEditor's labeling support (``README.md:541-599``):
labels live next to the PLY as ``<cloud>.labels`` — a raw uint8 buffer, one
index per point — and a text label-definition file maps indices to names and
display colors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict

import numpy as np


@dataclass
class LabelDefinition:
    index: int
    name: str
    color: np.ndarray  # (3,) uint8


def read_label_definitions(path: str) -> Dict[int, LabelDefinition]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            idx = int(tok[0])
            out[idx] = LabelDefinition(
                idx, tok[1], np.asarray([int(tok[2]), int(tok[3]), int(tok[4])], np.uint8)
            )
    return out


def label_path_for(cloud_path: str) -> str:
    return os.path.splitext(cloud_path)[0] + ".labels"


def read_labels(path: str, num_points: int) -> np.ndarray:
    labels = np.fromfile(path, np.uint8)
    if len(labels) != num_points:
        raise ValueError(
            f"{path}: label file has {len(labels)} entries, cloud has {num_points} points"
        )
    return labels


def write_labels(path: str, labels: np.ndarray) -> None:
    np.ascontiguousarray(labels, np.uint8).tofile(path)
