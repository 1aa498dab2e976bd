"""Minimal PLY triangle-mesh IO (numpy only).

The reference delegates PLY loading to trimesh (`DiffRender.py:304`); trimesh
is not available here, so this module implements the subset of PLY needed for
the bundled datasets: binary little-endian and ascii files with float/double
vertex properties (extra properties like `quality` are skipped) and
`uchar/int` face lists of triangles.
"""

from __future__ import annotations

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load a triangle mesh. Returns (vertices [V,3] float64, faces [F,3] int64)."""
    with open(path, "rb") as fh:
        raw = fh.read()

    # --- parse header ---
    end = raw.find(b"end_header\n")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header = raw[:end].decode("ascii", errors="replace").splitlines()
    body = raw[end + len(b"end_header\n"):]

    if not header or header[0].strip() != "ply":
        raise ValueError(f"{path}: missing 'ply' magic")

    fmt = None
    elements = []  # list of (name, count, [(prop_kind, ...)])
    for line in header[1:]:
        tok = line.strip().split()
        if not tok or tok[0] == "comment" or tok[0] == "obj_info":
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if tok[1] == "list":
                elements[-1][2].append(("list", _PLY_DTYPES[tok[2]],
                                        _PLY_DTYPES[tok[3]], tok[4]))
            else:
                elements[-1][2].append(("scalar", _PLY_DTYPES[tok[1]], tok[2]))

    if fmt not in ("binary_little_endian", "binary_big_endian", "ascii"):
        raise ValueError(f"{path}: unsupported format {fmt}")
    bo = ">" if fmt == "binary_big_endian" else "<"

    vertices = None
    faces = None

    if fmt == "ascii":
        lines = body.decode("ascii").split("\n")
        cursor = 0
        for name, count, props in elements:
            rows = lines[cursor:cursor + count]
            cursor += count
            if name == "vertex":
                names = [p[2] for p in props if p[0] == "scalar"]
                arr = np.array([[float(x) for x in r.split()] for r in rows])
                ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
                vertices = arr[:, [ix, iy, iz]].astype(np.float64)
            elif name == "face":
                fl = []
                for r in rows:
                    xs = r.split()
                    n = int(xs[0])
                    if n != 3:
                        raise ValueError(f"{path}: non-triangle face (n={n})")
                    fl.append([int(xs[1]), int(xs[2]), int(xs[3])])
                faces = np.asarray(fl, dtype=np.int64)
        return vertices, faces

    # --- binary ---
    offset = 0
    for name, count, props in elements:
        if any(p[0] == "list" for p in props):
            # Face-style element. Assume a single list property (plus no
            # trailing scalars — true for all bundled files).
            if len(props) != 1:
                raise ValueError(f"{path}: mixed list/scalar element unsupported")
            _, cnt_dt, idx_dt, _pname = props[0]
            cnt_size = np.dtype(cnt_dt).itemsize
            idx_size = np.dtype(idx_dt).itemsize
            # Peek the first count to get uniform arity (triangles expected).
            n0 = int(np.frombuffer(body, dtype=bo + cnt_dt, count=1, offset=offset)[0])
            if n0 != 3:
                raise ValueError(f"{path}: non-triangle faces (n={n0})")
            rec = np.dtype([("n", bo + cnt_dt), ("idx", bo + idx_dt, (3,))])
            data = np.frombuffer(body, dtype=rec, count=count, offset=offset)
            if not np.all(data["n"] == 3):
                raise ValueError(f"{path}: mixed-arity faces unsupported")
            if name == "face":
                faces = data["idx"].astype(np.int64)
            offset += count * (cnt_size + 3 * idx_size)
        else:
            rec = np.dtype([(p[2], bo + p[1]) for p in props])
            data = np.frombuffer(body, dtype=rec, count=count, offset=offset)
            if name == "vertex":
                vertices = np.stack(
                    [data["x"], data["y"], data["z"]], axis=1
                ).astype(np.float64)
            offset += count * rec.itemsize

    if vertices is None or faces is None:
        raise ValueError(f"{path}: missing vertex or face element")
    return vertices, faces


def save_ply(path: str, vertices: np.ndarray, faces: np.ndarray,
             binary: bool = True) -> None:
    """Write a triangle mesh as PLY (float32 coords, int32 indices)."""
    v = np.ascontiguousarray(np.asarray(vertices, dtype=np.float32))
    f = np.ascontiguousarray(np.asarray(faces, dtype=np.int32))
    assert v.ndim == 2 and v.shape[1] == 3, v.shape
    assert f.ndim == 2 and f.shape[1] == 3, f.shape
    header = (
        "ply\n"
        f"format {'binary_little_endian' if binary else 'ascii'} 1.0\n"
        "comment drt_tpu generated\n"
        f"element vertex {len(v)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(f)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        if binary:
            fh.write(v.astype("<f4").tobytes())
            rec = np.empty(len(f), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
            rec["n"] = 3
            rec["idx"] = f
            fh.write(rec.tobytes())
        else:
            for row in v:
                fh.write(f"{row[0]} {row[1]} {row[2]}\n".encode())
            for row in f:
                fh.write(f"3 {row[0]} {row[1]} {row[2]}\n".encode())
