"""Instant-NGP (.ingp) export/import: gzip-compressed msgpack of raw
pre-activation parameter bytes.

Reference format: threedgrut/export/ingp_exporter.py:27-76 — keys nre_data
{version, model:"mogt"}, precision ("single"|"half"), mog_num,
mog_sph_degree, and flat little-endian byte blobs mog_{positions, scales,
rotations, densities, features} where features = concat(albedo [N,3],
specular [N,(K-1)*3]) along dim 1. Import mirrors model.init_from_ingp.
"""
from __future__ import annotations

import gzip

import numpy as np

from threedgrut_tpu.model.gaussians import Gaussians, from_arrays


def _msgpack():
    try:
        import msgpack
        return msgpack
    except ImportError as e:  # pragma: no cover
        raise ImportError("msgpack is required for .ingp export") from e


def export_ingp(params: Gaussians, path: str, force_half: bool = False,
                max_sh_degree: int | None = None) -> None:
    msgpack = _msgpack()
    dtype = np.float16 if force_half else np.float32
    alive = np.asarray(params.alive)
    deg = max_sh_degree if max_sh_degree is not None else params.max_sh_degree
    features = np.concatenate(
        [np.asarray(params.features_albedo)[alive],
         np.asarray(params.features_specular)[alive]], axis=1)
    blob = {
        "nre_data": {"version": "0.0.1", "model": "mogt"},
        "precision": "half" if force_half else "single",
        "mog_num": int(alive.sum()),
        "mog_sph_degree": int(deg),
        "mog_positions": np.asarray(params.positions)[alive]
        .astype(dtype).tobytes(),
        "mog_scales": np.asarray(params.scale)[alive].astype(dtype).tobytes(),
        "mog_rotations": np.asarray(params.rotation)[alive]
        .astype(dtype).tobytes(),
        "mog_densities": np.asarray(params.density)[alive]
        .astype(dtype).tobytes(),
        "mog_features": features.astype(dtype).tobytes(),
    }
    with gzip.open(path, "wb") as f:
        f.write(msgpack.packb(blob))


def import_ingp(path: str, capacity: int | None = None) -> Gaussians:
    msgpack = _msgpack()
    with gzip.open(path, "rb") as f:
        blob = msgpack.unpackb(f.read(), raw=False)
    n = blob["mog_num"]
    dtype = np.float16 if blob["precision"] == "half" else np.float32

    def arr(key, cols):
        a = np.frombuffer(blob[key], dtype=dtype).astype(np.float32)
        return a.reshape(n, cols)

    feats_dim = (blob["mog_sph_degree"] + 1) ** 2 * 3
    feats = arr("mog_features", feats_dim)
    return from_arrays(
        arr("mog_positions", 3), arr("mog_rotations", 4),
        arr("mog_scales", 3), arr("mog_densities", 1),
        feats[:, :3], feats[:, 3:], capacity=capacity)
