"""3DGS-ecosystem-compatible PLY export/import.

Reference format: threedgrut/export/ply_exporter.py:27-86 — binary-little-
endian PLY, one 'vertex' element with x/y/z, nx/ny/nz (dummy 0,0,1),
f_dc_{0..2}, f_rest_{k} in channel-major (F) order, opacity (pre-sigmoid),
scale_{0..2} (log), rot_{0..3} (wxyz, unnormalized) — all float32. The import
side mirrors model.init_from_ply (threedgrut/model/model.py:611-719).

Written with a tiny self-contained PLY reader/writer (no plyfile dependency).
"""
from __future__ import annotations

import io
from typing import Dict

import numpy as np

from threedgrut_tpu.model.gaussians import Gaussians, from_arrays


def _attribute_names(n_rest: int):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(n_rest)]
    names += ["opacity", "scale_0", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3"]
    return names


def export_ply(params: Gaussians, path: str) -> None:
    alive = np.asarray(params.alive)
    pos = np.asarray(params.positions)[alive]
    n = pos.shape[0]
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    albedo = np.asarray(params.features_albedo)[alive]
    spec = np.asarray(params.features_specular)[alive]
    k = spec.shape[1] // 3
    # [N, K*3] stored [coeff, channel] -> channel-major f_rest (F order).
    spec_f = spec.reshape(n, k, 3).transpose(0, 2, 1).reshape(n, k * 3)
    density = np.asarray(params.density)[alive]
    scales = np.asarray(params.scale)[alive]
    rot = np.asarray(params.rotation)[alive]

    attrs = np.concatenate(
        [pos, nrm, albedo, spec_f, density, scales, rot],
        axis=1).astype("<f4")
    names = _attribute_names(spec_f.shape[1])
    assert attrs.shape[1] == len(names)

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {a}" for a in names]
    header += ["end_header", ""]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(attrs.tobytes())


def read_ply_fields(path: str) -> Dict[str, np.ndarray]:
    """Minimal binary-little-endian float32 PLY vertex reader."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    n = None
    props = []
    fmt = None
    for line in header:
        t = line.split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element" and t[1] == "vertex":
            n = int(t[2])
        elif t[0] == "property" and n is not None:
            if t[1] not in ("float", "float32"):
                raise ValueError(f"unsupported property type {t[1]}")
            props.append(t[2])
    if fmt != "binary_little_endian":
        raise ValueError(f"unsupported ply format {fmt}")
    arr = np.frombuffer(data[head_end:], dtype="<f4",
                        count=n * len(props)).reshape(n, len(props))
    return {p: arr[:, i].copy() for i, p in enumerate(props)}


def import_ply(path: str, capacity: int | None = None) -> Gaussians:
    """Load a 3DGS-format PLY into a capacity-padded Gaussians pytree
    (reference: model.init_from_ply, model.py:611-719)."""
    fields = read_ply_fields(path)
    n = fields["x"].shape[0]
    pos = np.stack([fields["x"], fields["y"], fields["z"]], -1)
    albedo = np.stack([fields[f"f_dc_{i}"] for i in range(3)], -1)
    rest_names = sorted((k for k in fields if k.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    if rest_names:
        rest = np.stack([fields[k] for k in rest_names], -1)  # [N, 3K] F-order
        k = rest.shape[1] // 3
        spec = rest.reshape(n, 3, k).transpose(0, 2, 1).reshape(n, k * 3)
    else:
        spec = np.zeros((n, 0), np.float32)
    density = fields["opacity"][:, None]
    scales = np.stack([fields[f"scale_{i}"] for i in range(3)], -1)
    rot = np.stack([fields[f"rot_{i}"] for i in range(4)], -1)
    return from_arrays(pos, rot, scales, density, albedo, spec,
                       capacity=capacity)
