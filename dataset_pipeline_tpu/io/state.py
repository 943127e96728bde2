"""COLMAP state <-> framework state conversion.

Counterpart of ``InitializeStateFromColmapModel`` / ``ExportProblemToColmap``
(``io/colmap_model.cc:788-``, ``:518-``): cameras are instantiated from
COLMAP params with the principal point shifted by -0.5 to the center-of-pixel
convention (``colmap_model.cc:834``), image translations are multiplied by
the global ``scale_factor`` on load and divided on export
(``colmap_model.cc:130-131,166-175``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from dataset_pipeline_tpu.io import colmap as cio
from dataset_pipeline_tpu.models import cameras as cm


@dataclass
class ImageState:
    image_id: int
    camera_id: int
    name: str
    qvec: np.ndarray  # wxyz, image_T_global
    tvec: np.ndarray  # scale-factor-normalized


@dataclass
class ModelState:
    cameras: Dict[int, cm.Camera]
    images: List[ImageState]  # sorted by image_id
    scale_factor: float


def _shift_principal(model: str, params: np.ndarray, delta: float) -> np.ndarray:
    p = np.asarray(params, np.float64).copy()
    spec = cm.CAMERA_MODELS[model]
    i = 1 if spec.unique_focal else 2
    p[i] += delta
    p[i + 1] += delta
    return p


def load_colmap_state(state_dir: str, scale_factor: float = 1.0,
                      camera_ids_to_ignore=()) -> ModelState:
    model = cio.read_model(state_dir)
    cams: Dict[int, cm.Camera] = {}
    for cid in sorted(model.cameras):
        if cid in camera_ids_to_ignore:
            continue
        c = model.cameras[cid]
        name = c.model
        if name not in cm.CAMERA_MODELS:
            raise ValueError(f"unsupported camera model {name}")
        params = _shift_principal(name, c.params, -0.5)
        cams[cid] = cm.make_camera(name, c.width, c.height, params)
    images = []
    for iid in sorted(model.images):
        im = model.images[iid]
        if im.camera_id in camera_ids_to_ignore:
            continue
        images.append(
            ImageState(im.image_id, im.camera_id, im.name,
                       im.qvec.copy(), im.tvec * scale_factor)
        )
    return ModelState(cams, images, scale_factor)


def save_colmap_state(state_dir: str, state: ModelState) -> None:
    cams = {}
    for cid, cam in state.cameras.items():
        params = _shift_principal(cam.model, np.asarray(cam.params), +0.5)
        cams[cid] = cio.ColmapCamera(cid, cam.model, cam.width, cam.height, params)
    imgs = {}
    for im in state.images:
        imgs[im.image_id] = cio.ColmapImage(
            im.image_id, im.qvec, im.tvec / state.scale_factor, im.camera_id, im.name
        )
    cio.write_model(state_dir, cio.ColmapModel(cams, imgs, {}))
