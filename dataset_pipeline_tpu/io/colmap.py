"""COLMAP text model + rigs.json read/write.

Counterpart of ``/root/reference/src/io/colmap_model.{h,cc}``:

- ``cameras.txt``:   CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]         (``colmap_model.cc:53-100``)
- ``images.txt``:    IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME
                     + one observations line (X Y POINT3D_ID)*     (``colmap_model.cc:102-190``)
- ``points3D.txt``:  POINT3D_ID X Y Z R G B ERROR (IMAGE_ID POINT2D_IDX)*
- ``rigs.json``:     [{"ref_camera_id": int,
                       "cameras": [{"camera_id": int, "image_prefix": str}]}]
                                                                   (``colmap_model.cc:192-265``)

Pose convention matches COLMAP/the reference: ``image_T_global`` (world->cam)
as quaternion wxyz + translation. Any global ``scale_factor`` handling (the
reference multiplies translations on read, divides on write,
``colmap_model.cc:130-131,166-175``) is left to the caller so this module
stays a faithful, stateless codec.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class ColmapCamera:
    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # float64


@dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray  # (4,) wxyz, image_T_global
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str
    xys: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    point3d_ids: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.int64))


@dataclass
class ColmapPoint3D:
    point3d_id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    track: List[Tuple[int, int]] = field(default_factory=list)


@dataclass
class ColmapRigCamera:
    camera_id: int
    image_prefix: str


@dataclass
class ColmapRig:
    ref_camera_id: int
    cameras: List[ColmapRigCamera] = field(default_factory=list)


def _data_lines(path: str):
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def read_cameras_txt(path: str) -> Dict[int, ColmapCamera]:
    cameras = {}
    for line in _data_lines(path):
        tok = line.split()
        cam = ColmapCamera(
            int(tok[0]), tok[1], int(tok[2]), int(tok[3]),
            np.asarray([float(v) for v in tok[4:]], np.float64),
        )
        cameras[cam.camera_id] = cam
    return cameras


def write_cameras_txt(path: str, cameras: Dict[int, ColmapCamera]) -> None:
    with open(path, "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        f.write(f"# Number of cameras: {len(cameras)}\n")
        for cid in sorted(cameras):
            c = cameras[cid]
            params = " ".join(_g(v) for v in c.params)
            f.write(f"{c.camera_id} {c.model} {c.width} {c.height} {params}\n")


def read_images_txt(path: str, read_observations: bool = True) -> Dict[int, ColmapImage]:
    images = {}
    lines = list(_data_lines(path))
    # images.txt alternates: pose line, observations line. Blank observation
    # lines are stripped by _data_lines, so re-read raw to keep pairing.
    with open(path, "r") as f:
        raw = [l.rstrip("\n") for l in f]
    i = 0
    while i < len(raw):
        line = raw[i].strip()
        i += 1
        if not line or line.startswith("#"):
            continue
        tok = line.split()
        img = ColmapImage(
            int(tok[0]),
            np.asarray([float(tok[1]), float(tok[2]), float(tok[3]), float(tok[4])]),
            np.asarray([float(tok[5]), float(tok[6]), float(tok[7])]),
            int(tok[8]),
            tok[9] if len(tok) > 9 else "",
        )
        # observations line (may be empty)
        if i < len(raw):
            obs_tok = raw[i].strip().split()
            i += 1
            if read_observations and obs_tok:
                vals = np.asarray(obs_tok, np.float64).reshape(-1, 3)
                img.xys = vals[:, :2].copy()
                img.point3d_ids = vals[:, 2].astype(np.int64)
        images[img.image_id] = img
    return images


def write_images_txt(path: str, images: Dict[int, ColmapImage]) -> None:
    with open(path, "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        f.write(f"# Number of images: {len(images)}\n")
        for iid in sorted(images):
            im = images[iid]
            q, t = im.qvec, im.tvec
            f.write(
                f"{im.image_id} {_g(q[0])} {_g(q[1])} {_g(q[2])} {_g(q[3])} "
                f"{_g(t[0])} {_g(t[1])} {_g(t[2])} {im.camera_id} {im.name}\n"
            )
            obs = " ".join(
                f"{_g(x)} {_g(y)} {int(pid)}"
                for (x, y), pid in zip(im.xys, im.point3d_ids)
            )
            f.write(obs + "\n")


def read_points3d_txt(path: str) -> Dict[int, ColmapPoint3D]:
    points = {}
    for line in _data_lines(path):
        tok = line.split()
        p = ColmapPoint3D(
            int(tok[0]),
            np.asarray([float(tok[1]), float(tok[2]), float(tok[3])]),
            np.asarray([int(tok[4]), int(tok[5]), int(tok[6])], np.uint8),
            float(tok[7]),
            [(int(tok[i]), int(tok[i + 1])) for i in range(8, len(tok) - 1, 2)],
        )
        points[p.point3d_id] = p
    return points


def write_points3d_txt(path: str, points: Dict[int, ColmapPoint3D]) -> None:
    with open(path, "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write("#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as (IMAGE_ID, POINT2D_IDX)\n")
        f.write(f"# Number of points: {len(points)}\n")
        for pid in sorted(points):
            p = points[pid]
            track = " ".join(f"{a} {b}" for a, b in p.track)
            f.write(
                f"{p.point3d_id} {_g(p.xyz[0])} {_g(p.xyz[1])} {_g(p.xyz[2])} "
                f"{int(p.rgb[0])} {int(p.rgb[1])} {int(p.rgb[2])} {_g(p.error)}"
                + (f" {track}" if track else "")
                + "\n"
            )


def read_rigs_json(path: str) -> List[ColmapRig]:
    with open(path, "r") as f:
        doc = json.load(f)
    rigs = []
    for rig in doc:
        rigs.append(
            ColmapRig(
                int(rig["ref_camera_id"]),
                [
                    ColmapRigCamera(int(c["camera_id"]), c["image_prefix"])
                    for c in rig.get("cameras", [])
                ],
            )
        )
    return rigs


def write_rigs_json(path: str, rigs: List[ColmapRig]) -> None:
    doc = [
        {
            "ref_camera_id": r.ref_camera_id,
            "cameras": [
                {"camera_id": c.camera_id, "image_prefix": c.image_prefix}
                for c in r.cameras
            ],
        }
        for r in rigs
    ]
    with open(path, "w") as f:
        json.dump(doc, f)


@dataclass
class ColmapModel:
    cameras: Dict[int, ColmapCamera]
    images: Dict[int, ColmapImage]
    points: Optional[Dict[int, ColmapPoint3D]] = None


def read_model(folder: str, read_points: bool = False) -> ColmapModel:
    cameras = read_cameras_txt(os.path.join(folder, "cameras.txt"))
    images = read_images_txt(os.path.join(folder, "images.txt"))
    points = None
    p3d = os.path.join(folder, "points3D.txt")
    if read_points and os.path.exists(p3d):
        points = read_points3d_txt(p3d)
    return ColmapModel(cameras, images, points)


def write_model(folder: str, model: ColmapModel) -> None:
    os.makedirs(folder, exist_ok=True)
    write_cameras_txt(os.path.join(folder, "cameras.txt"), model.cameras)
    write_images_txt(os.path.join(folder, "images.txt"), model.images)
    write_points3d_txt(os.path.join(folder, "points3D.txt"), model.points or {})


def _g(v: float) -> str:
    """C++ ostream-like shortest general float formatting."""
    return f"{float(v):.9g}"
