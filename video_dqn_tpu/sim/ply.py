"""Minimal PLY triangle-mesh IO (ascii + binary_little_endian) and a tiny
OBJ reader.

Scene-asset boundary for the mesh simulator backend: the reference gets
its scene geometry through habitat-sim's GLB loader
(/root/reference/habitat_test_env.py:46-60 scene reconfigure); Gibson
scenes are distributed as .glb/.obj/.ply variants, and PLY/OBJ cover the
openly convertible ones. Only position (+ optional per-vertex uchar RGB)
and triangular faces are consumed; all other properties are skipped.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np


def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray,
              colors: Optional[np.ndarray] = None, binary: bool = True) -> None:
    """vertices (N,3) float; faces (M,3) int; colors optional (N,3) uint8."""
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int32)
    n, m = len(vertices), len(faces)
    has_c = colors is not None
    if has_c:
        colors = np.asarray(colors, np.uint8)
        assert colors.shape == (n, 3)
    fmt = "binary_little_endian 1.0" if binary else "ascii 1.0"
    header = [
        "ply",
        f"format {fmt}",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if has_c:
        header += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    header += [
        f"element face {m}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            if has_c:
                for i in range(n):
                    f.write(struct.pack("<fff", *vertices[i]))
                    f.write(struct.pack("<BBB", *colors[i]))
            else:
                f.write(vertices.astype("<f4").tobytes())
            for i in range(m):
                f.write(struct.pack("<Biii", 3, *faces[i]))
        else:
            for i in range(n):
                row = f"{vertices[i,0]} {vertices[i,1]} {vertices[i,2]}"
                if has_c:
                    row += f" {colors[i,0]} {colors[i,1]} {colors[i,2]}"
                f.write((row + "\n").encode())
            for i in range(m):
                f.write(f"3 {faces[i,0]} {faces[i,1]} {faces[i,2]}\n".encode())


_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1),
    "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2),
    "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4),
    "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def read_ply(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Returns (vertices (N,3) float32, faces (M,3) int32, colors or None).
    Quad faces are triangulated with a fan."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.find(b"end_header")
    assert end >= 0, "not a PLY file"
    header = data[:end].decode("ascii", "replace").split("\n")
    body = data[end:]
    body = body[body.find(b"\n") + 1:]

    fmt = "ascii"
    elements = []  # (name, count, [(prop_name, type, list_count_type|None)])
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append((parts[4], parts[3], parts[2]))
            else:
                elements[-1][2].append((parts[2], parts[1], None))

    verts = faces = colors = None
    if fmt == "ascii":
        tokens = body.decode("ascii", "replace").split()
        ti = 0
        for name, count, props in elements:
            if name == "vertex":
                names = [p[0] for p in props]
                rows = np.array(
                    tokens[ti:ti + count * len(props)], np.float64
                ).reshape(count, len(props))
                ti += count * len(props)
                verts, colors = _extract_vertex(rows, names)
            elif name == "face":
                fl = []
                for _ in range(count):
                    k = int(tokens[ti]); ti += 1
                    idx = [int(tokens[ti + j]) for j in range(k)]; ti += k
                    for j in range(1, k - 1):
                        fl.append((idx[0], idx[j], idx[j + 1]))
                faces = np.asarray(fl, np.int32)
            else:
                ti += count * len(props)
    else:
        little = "little" in fmt
        assert little, "big-endian PLY unsupported"
        off = 0
        for name, count, props in elements:
            if name == "vertex":
                names = [p[0] for p in props]
                fmts = "<" + "".join(_PLY_TYPES[p[1]][0] for p in props)
                sz = struct.calcsize(fmts)
                rows = np.array(
                    [struct.unpack_from(fmts, body, off + i * sz)
                     for i in range(count)], np.float64)
                off += count * sz
                verts, colors = _extract_vertex(rows, names)
            elif name == "face":
                fl = []
                (lname, ltype, ctype) = props[0]
                cfmt, csz = _PLY_TYPES[ctype]
                ifmt, isz = _PLY_TYPES[ltype]
                for _ in range(count):
                    k = struct.unpack_from("<" + cfmt, body, off)[0]
                    off += csz
                    idx = struct.unpack_from(f"<{k}{ifmt}", body, off)
                    off += k * isz
                    for j in range(1, k - 1):
                        fl.append((idx[0], idx[j], idx[j + 1]))
                faces = np.asarray(fl, np.int32)
            else:  # skip fixed-size unknown elements
                sz = sum(_PLY_TYPES[p[1]][1] for p in props if p[2] is None)
                off += count * sz
    assert verts is not None and faces is not None
    return verts, faces, colors


def _extract_vertex(rows: np.ndarray, names):
    xi, yi, zi = names.index("x"), names.index("y"), names.index("z")
    verts = rows[:, [xi, yi, zi]].astype(np.float32)
    colors = None
    if "red" in names:
        ri = names.index("red")
        colors = rows[:, [ri, names.index("green"), names.index("blue")]]
        colors = np.clip(colors, 0, 255).astype(np.uint8)
    return verts, colors


def read_obj(path: str) -> Tuple[np.ndarray, np.ndarray, None]:
    """Tiny OBJ reader: v / f lines only; polygon faces fan-triangulated;
    1-based (and negative) indices handled. Returns (verts, faces, None)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for j in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[j], idx[j + 1]))
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32), None)


def load_mesh(path: str):
    """Dispatch on extension. Returns (verts, faces, colors_or_None)."""
    lower = path.lower()
    if lower.endswith(".obj"):
        return read_obj(path)
    return read_ply(path)
