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


def test_usdz_export(tmp_path):
    import gzip, io, zipfile
    import msgpack
    from threedgrut_tpu.export import usdz

    p = make_params()
    path = str(tmp_path / "model.usdz")
    poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
    usdz.export_usdz(p, path, dataset_poses=poses)
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        assert names[0].endswith(".usda")  # first entry must be a USD layer
        assert any(n.endswith(".nurec") for n in names)
        usda = z.read(names[0]).decode()
        assert "#usda 1.0" in usda
        nurec = [n for n in names if n.endswith(".nurec")][0]
        blob = msgpack.unpackb(gzip.decompress(z.read(nurec)), raw=False)
    sd = blob["nre_data"]["state_dict"]
    assert sd[".gaussians_nodes.gaussians.positions.shape"] == [10, 3]
    pos = np.frombuffer(sd[".gaussians_nodes.gaussians.positions"],
                        np.float16).reshape(10, 3)
    np.testing.assert_allclose(
        pos, np.asarray(p.positions)[np.asarray(p.alive)], atol=2e-3)


def test_normalizing_transform():
    from threedgrut_tpu.export.usdz import estimate_normalizing_transform
    rng = np.random.default_rng(0)
    poses = np.stack([np.eye(4)] * 5)
    poses[:, :3, 3] = rng.normal(size=(5, 3)) + 10.0
    T = estimate_normalizing_transform(poses)
    # A plain LIST of 4x4s (what datasets hand the trainer's USDZ export)
    # must work identically — regression for the r4 CLI acceptance crash.
    T_list = estimate_normalizing_transform([p for p in poses])
    np.testing.assert_array_equal(T, T_list)
    # Mean camera maps to the origin.
    mean = poses[:, :3, 3].mean(0)
    out = T[:3, :3] @ mean + T[:3, 3]
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_ply_to_usd_script(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from scripts.ply_to_usd import main as ply2usd
    from threedgrut_tpu.export.ply import export_ply
    p = make_params()
    ply_path = str(tmp_path / "m.ply")
    export_ply(p, ply_path)
    rc = ply2usd([ply_path])
    assert rc == 0
    import zipfile
    assert zipfile.ZipFile(ply_path.replace(".ply", ".usdz")).namelist()


def test_api_surface(tmp_path):
    """Top-level api: load_scene + render + trace."""
    import jax.numpy as jnp
    from threedgrut_tpu import api
    from threedgrut_tpu.cameras import PinholeCamera, SensorPose
    from threedgrut_tpu.export.ply import export_ply

    p = make_params()
    path = str(tmp_path / "s.ply")
    export_ply(p, path)
    g = api.load_scene(path)
    cam = PinholeCamera(jnp.asarray([30.0, 30.0]), jnp.asarray([8.0, 8.0]),
                        jnp.zeros(6), jnp.zeros(2), jnp.zeros(4))
    pose = SensorPose(jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3),
                      jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3))
    out, ovf = api.render(g, cam, pose, (16, 16), isect_capacity=2048)
    assert out.rgb.shape == (16, 16, 3)
    o = jnp.zeros((100, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (100, 1))
    tr = api.trace(g, o, d, candidate_capacity=16)
    assert tr.rgb.shape == (100, 3)
