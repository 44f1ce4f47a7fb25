"""Exporters/importers: PLY and INGP round trips preserve parameters."""
import numpy as np

from threedgrut_tpu.export import ingp, ply
from threedgrut_tpu.model import gaussians


def make_params(n=10, cap=16):
    rng = np.random.default_rng(0)
    return gaussians.from_arrays(
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 4)).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 1)).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 45)).astype(np.float32),
        capacity=cap)


def test_ply_roundtrip(tmp_path):
    p = make_params()
    path = str(tmp_path / "model.ply")
    ply.export_ply(p, path)
    q = ply.import_ply(path)
    alive = np.asarray(p.alive)
    for f in ("positions", "rotation", "scale", "density",
              "features_albedo", "features_specular"):
        np.testing.assert_allclose(
            np.asarray(getattr(q, f))[:10],
            np.asarray(getattr(p, f))[alive], atol=1e-6, err_msg=f)
    assert int(q.num_active()) == 10


def test_ply_header_is_3dgs_compatible(tmp_path):
    p = make_params()
    path = str(tmp_path / "model.ply")
    ply.export_ply(p, path)
    head = open(path, "rb").read(4096).split(b"end_header")[0].decode()
    for needle in ("f_dc_0", "f_rest_44", "opacity", "scale_2", "rot_3",
                   "element vertex 10", "binary_little_endian"):
        assert needle in head, needle


def test_ingp_roundtrip(tmp_path):
    p = make_params()
    path = str(tmp_path / "model.ingp")
    ingp.export_ingp(p, path)
    q = ingp.import_ingp(path)
    alive = np.asarray(p.alive)
    for f in ("positions", "rotation", "scale", "density",
              "features_albedo", "features_specular"):
        np.testing.assert_allclose(
            np.asarray(getattr(q, f))[:10],
            np.asarray(getattr(p, f))[alive], atol=1e-6, err_msg=f)


def test_ingp_half_precision(tmp_path):
    p = make_params()
    path = str(tmp_path / "model_h.ingp")
    ingp.export_ingp(p, path, force_half=True)
    q = ingp.import_ingp(path)
    np.testing.assert_allclose(
        np.asarray(q.positions)[:10],
        np.asarray(p.positions)[np.asarray(p.alive)], atol=2e-3)
