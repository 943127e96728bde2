"""Numpy-backed PLY point-cloud / mesh I/O (ascii + binary little endian).

Host-side replacement for the reference's PCL PLY loaders (e.g.
``io/meshlab_project.h:76-132``, ``exe/normal_estimator.cc:98-160``): reads
into structs-of-arrays (positions ``(N,3) f32``, optional normals, colors,
faces) ready for device upload; writes both formats including the custom
x,y,z,nx,ny,nz,rgb layout the reference's NormalEstimator emits.
"""

from __future__ import annotations

import io as _io
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_TO_NP = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_NP_TO_PLY = {
    "i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort",
    "i4": "int", "u4": "uint", "f4": "float", "f8": "double",
}


@dataclass
class PointCloud:
    """Structs-of-arrays point cloud (+ optional triangle mesh)."""

    positions: np.ndarray  # (N,3) float32
    normals: Optional[np.ndarray] = None  # (N,3) float32
    colors: Optional[np.ndarray] = None  # (N,3) uint8
    faces: Optional[np.ndarray] = None  # (F,3) int32
    extras: Dict[str, np.ndarray] = field(default_factory=dict)

    def __len__(self):
        return len(self.positions)


def _parse_header(f) -> Tuple[str, List[Tuple[str, int, list]]]:
    line = f.readline().strip()
    if line != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements = []  # (name, count, [(prop_name, dtype) or ('list', idx_t, val_t, name)])
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in header")
        tokens = line.decode("ascii", "replace").strip().split()
        if not tokens or tokens[0] == "comment" or tokens[0] == "obj_info":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append((tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if tokens[1] == "list":
                elements[-1][2].append(("list", _PLY_TO_NP[tokens[2]], _PLY_TO_NP[tokens[3]], tokens[4]))
            else:
                elements[-1][2].append((tokens[2], _PLY_TO_NP[tokens[1]]))
        elif tokens[0] == "end_header":
            break
    if fmt not in ("ascii", "binary_little_endian", "binary_big_endian"):
        raise ValueError(f"unsupported PLY format {fmt}")
    return fmt, elements


def read_ply(path: str) -> PointCloud:
    with open(path, "rb") as f:
        fmt, elements = _parse_header(f)
        endian = ">" if fmt == "binary_big_endian" else "<"
        data: Dict[str, dict] = {}
        for name, count, props in elements:
            has_list = any(p[0] == "list" for p in props)
            if not has_list:
                dt = np.dtype([(p[0], endian + p[1]) for p in props])
                if fmt == "ascii":
                    rows = np.loadtxt(
                        _io.StringIO(
                            "".join(f.readline().decode("ascii") for _ in range(count))
                        ),
                        dtype=np.float64,
                        ndmin=2,
                    )
                    rec = np.zeros(count, dt)
                    for i, p in enumerate(props):
                        rec[p[0]] = rows[:, i]
                else:
                    rec = np.fromfile(f, dt, count)
                data[name] = {p[0]: np.ascontiguousarray(rec[p[0]]) for p in props}
            else:
                # assume the common case: single list property (faces)
                lists = []
                if fmt == "ascii":
                    for _ in range(count):
                        vals = f.readline().split()
                        n = int(vals[0])
                        lists.append([int(v) for v in vals[1 : 1 + n]])
                else:
                    idx_t = np.dtype(endian + props[0][1])
                    val_t = np.dtype(endian + props[0][2])
                    for _ in range(count):
                        n = int(np.frombuffer(f.read(idx_t.itemsize), idx_t)[0])
                        lists.append(np.frombuffer(f.read(val_t.itemsize * n), val_t))
                if lists and all(len(l) == 3 for l in lists):
                    data[name] = {"faces": np.asarray(lists, np.int32)}
                else:
                    data[name] = {"faces_ragged": lists}

    verts = data.get("vertex", {})
    if not verts:
        raise ValueError("PLY has no vertex element")
    pos = np.stack([verts["x"], verts["y"], verts["z"]], -1).astype(np.float32)
    normals = None
    if "nx" in verts:
        normals = np.stack([verts["nx"], verts["ny"], verts["nz"]], -1).astype(np.float32)
    colors = None
    if "red" in verts:
        colors = np.stack([verts["red"], verts["green"], verts["blue"]], -1).astype(np.uint8)
    elif "diffuse_red" in verts:
        colors = np.stack(
            [verts["diffuse_red"], verts["diffuse_green"], verts["diffuse_blue"]], -1
        ).astype(np.uint8)
    faces = None
    if "face" in data and "faces" in data["face"]:
        faces = data["face"]["faces"]
    used = {"x", "y", "z", "nx", "ny", "nz", "red", "green", "blue",
            "diffuse_red", "diffuse_green", "diffuse_blue"}
    extras = {k: v for k, v in verts.items() if k not in used}
    return PointCloud(pos, normals, colors, faces, extras)


def write_ply(path: str, cloud: PointCloud, binary: bool = True) -> None:
    n = len(cloud)
    fields: List[Tuple[str, str, np.ndarray]] = [
        ("x", "f4", cloud.positions[:, 0]),
        ("y", "f4", cloud.positions[:, 1]),
        ("z", "f4", cloud.positions[:, 2]),
    ]
    if cloud.normals is not None:
        for i, nme in enumerate(("nx", "ny", "nz")):
            fields.append((nme, "f4", cloud.normals[:, i]))
    if cloud.colors is not None:
        for i, nme in enumerate(("red", "green", "blue")):
            fields.append((nme, "u1", cloud.colors[:, i]))
    for k, v in cloud.extras.items():
        fields.append((k, _NP_TO_PLY_inv(v.dtype), v))

    with open(path, "wb") as f:
        f.write(b"ply\n")
        f.write(
            b"format binary_little_endian 1.0\n" if binary else b"format ascii 1.0\n"
        )
        f.write(f"element vertex {n}\n".encode())
        for name, dt, _ in fields:
            f.write(f"property {_NP_TO_PLY[dt]} {name}\n".encode())
        if cloud.faces is not None:
            f.write(f"element face {len(cloud.faces)}\n".encode())
            f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")

        if binary:
            rec = np.zeros(n, np.dtype([(name, "<" + dt) for name, dt, _ in fields]))
            for name, _, v in fields:
                rec[name] = v
            rec.tofile(f)
            if cloud.faces is not None:
                fc = np.zeros(
                    len(cloud.faces),
                    np.dtype([("n", "u1"), ("a", "<i4"), ("b", "<i4"), ("c", "<i4")]),
                )
                fc["n"] = 3
                fc["a"], fc["b"], fc["c"] = (
                    cloud.faces[:, 0],
                    cloud.faces[:, 1],
                    cloud.faces[:, 2],
                )
                fc.tofile(f)
        else:
            cols = [v for _, _, v in fields]
            for i in range(n):
                f.write(
                    (" ".join(_fmt_val(c[i]) for c in cols) + "\n").encode()
                )
            if cloud.faces is not None:
                for tri in cloud.faces:
                    f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n".encode())


def _fmt_val(v):
    if isinstance(v, (np.floating, float)):
        return repr(float(np.float32(v)))
    return str(int(v))


def _NP_TO_PLY_inv(dtype) -> str:
    key = dtype.str.lstrip("<>=|")
    if key not in _NP_TO_PLY:
        raise ValueError(f"unsupported extra dtype {dtype}")
    return key
