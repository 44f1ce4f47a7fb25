"""Playground hybrid path tracer: mesh intersection, materials, engine."""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.playground import engine as eng_mod
from threedgrut_tpu.playground import materials as mat_mod
from threedgrut_tpu.playground import mesh as mesh_mod
from threedgrut_tpu.playground.envmap import filmic_tonemap, sample_envmap
from tests.test_gut_reference import random_scene


def test_mesh_intersect_quad():
    quad = mesh_mod.make_quad([0, 0, 2.0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 0.0], [0.2, -0.3, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    hit = mesh_mod.intersect(quad, o, d)
    np.testing.assert_allclose(hit.t[0], 2.0, atol=1e-5)
    assert hit.material_id[1] == -1          # misses to the side
    np.testing.assert_allclose(hit.t[2], 2.0, atol=1e-5)
    # Normal points along -z or +z.
    assert abs(abs(float(hit.normal[0, 2])) - 1.0) < 1e-5


def test_mesh_intersect_closest_of_two():
    near = mesh_mod.make_quad([0, 0, 1.0], [1, 0, 0], [0, 1, 0], material_id=0)
    far = mesh_mod.make_quad([0, 0, 3.0], [1, 0, 0], [0, 1, 0], material_id=1)
    m = mesh_mod.merge_meshes([near, far])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = mesh_mod.intersect(m, o, d)
    np.testing.assert_allclose(hit.t[0], 1.0, atol=1e-5)
    assert int(hit.material_id[0]) == 0


def test_icosphere_and_obj(tmp_path):
    sph = mesh_mod.make_icosphere([0, 0, 0], 1.0, subdivisions=1)
    assert sph.num_faces == 80
    # OBJ round trip.
    path = tmp_path / "m.obj"
    v = np.asarray(sph.vertices)
    f = np.asarray(sph.faces)
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for tri in f:
            fh.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    m2 = mesh_mod.load_obj(str(path))
    assert m2.num_faces == 80
    # Ray through the center hits at t = dist - radius.
    hit = mesh_mod.intersect(m2, jnp.asarray([[0., 0., -3.]]),
                             jnp.asarray([[0., 0., 1.]]))
    np.testing.assert_allclose(hit.t[0], 2.0, atol=1e-2)


def test_materials_mirror_and_glass():
    mats = mat_mod.make_materials([
        dict(kind=mat_mod.MaterialKind.MIRROR, base_color=(0.9, 0.9, 0.9)),
        dict(kind=mat_mod.MaterialKind.GLASS, ior=1.5),
    ])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    n = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    env = jnp.ones((2, 3))
    nd, atten, emitted, cont = mat_mod.bounce(
        mats, jnp.asarray([0, 1]), d, n, env)
    np.testing.assert_allclose(nd[0], [0, 0, -1], atol=1e-6)  # reflect back
    np.testing.assert_allclose(nd[1], [0, 0, 1], atol=1e-6)   # straight through
    assert bool(cont[0]) and bool(cont[1])


def test_envmap_sampling():
    env = jnp.zeros((8, 16, 3)).at[:, :, 0].set(1.0)
    c = sample_envmap(env, jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(c[:, 0], 1.0, atol=1e-5)
    assert float(filmic_tonemap(jnp.asarray(0.0))) == 0.0
    assert 0.7 < float(filmic_tonemap(jnp.asarray(1.0))) <= 1.0


def test_engine_gaussians_only():
    pos, quat, scale, opa, feats = random_scene(n=48, seed=1)
    from tests.test_cameras import make_pinhole
    cfg = eng_mod.EngineConfig(max_bounces=1, candidate_capacity=48)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, config=cfg)
    cam = make_pinhole(f=30.0, cx=8.0, cy=8.0)
    out = e.render(cam, jnp.eye(4), (16, 16))
    assert out["rgb"].shape == (16, 16, 3)
    assert float(out["opacity"].max()) > 0.1


def test_engine_with_mirror_floor():
    """Gaussian scene above a mirror: reflected rays pick up radiance that a
    single-bounce render cannot see."""
    pos, quat, scale, opa, feats = random_scene(n=48, seed=2)
    from tests.test_cameras import make_pinhole
    mirror = mesh_mod.make_quad([0.0, 1.2, 3.0], [4.0, 0, 0], [0, 0, 4.0],
                                material_id=0)
    mats = mat_mod.make_materials(
        [dict(kind=mat_mod.MaterialKind.MIRROR, base_color=(1.0, 1.0, 1.0))])
    cfg = eng_mod.EngineConfig(max_bounces=3, candidate_capacity=48)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, mesh=mirror,
                       materials=mats, config=cfg)
    cam = make_pinhole(f=30.0, cx=8.0, cy=8.0)
    out = e.render(cam, jnp.eye(4), (16, 16))
    assert np.isfinite(np.asarray(out["rgb"])).all()

    cfg1 = eng_mod.EngineConfig(max_bounces=1, candidate_capacity=48)
    e1 = eng_mod.Engine(pos, quat, scale, opa, feats, mesh=mirror,
                        materials=mats, config=cfg1)
    out1 = e1.render(cam, jnp.eye(4), (16, 16))
    # More bounces gather at least as much radiance.
    assert float(out["rgb"].sum()) >= float(out1["rgb"].sum()) - 1e-5


def test_engine_spp_and_envmap():
    pos, quat, scale, opa, feats = random_scene(n=24, seed=3)
    from tests.test_cameras import make_pinhole
    env = jnp.ones((4, 8, 3)) * 0.25
    cfg = eng_mod.EngineConfig(max_bounces=1, spp=2, candidate_capacity=24)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, envmap=env, config=cfg)
    cam = make_pinhole(f=30.0, cx=8.0, cy=8.0)
    out = e.render(cam, jnp.eye(4), (16, 16), key=jax.random.PRNGKey(7))
    # Fully transparent pixels see the environment (0.25 through miss path).
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert float(out["rgb"].min()) >= 0.0


def test_gut_tmax_segment_bound():
    """Per-ray t_max in the rasterizer: zero/None = unbounded; a tight bound
    removes opacity."""
    import jax.numpy as jnp
    from tests.test_cameras import IDENTITY_POSE, make_pinhole
    from threedgrut_tpu.render import gut
    pos, quat, scale, opa, feats = random_scene(n=64, seed=5)
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)
    res = (32, 32)
    base, _ = gut.render(pos, quat, scale, opa, feats, cam, IDENTITY_POSE,
                         res, 4096)
    unbounded, _ = gut.render(pos, quat, scale, opa, feats, cam,
                              IDENTITY_POSE, res, 4096,
                              t_max=jnp.zeros(res[::-1]))
    np.testing.assert_allclose(np.asarray(unbounded.rgb),
                               np.asarray(base.rgb), atol=1e-6)
    tight, _ = gut.render(pos, quat, scale, opa, feats, cam, IDENTITY_POSE,
                          res, 4096, t_max=jnp.full(res[::-1], 2.0))
    assert float(tight.opacity.sum()) < float(base.opacity.sum())
    none_vis, _ = gut.render(pos, quat, scale, opa, feats, cam,
                             IDENTITY_POSE, res, 4096,
                             t_max=jnp.full(res[::-1], 1e-3))
    np.testing.assert_allclose(np.asarray(none_vis.opacity), 0.0, atol=1e-6)


def test_hybrid_render():
    """Hybrid 3DGRUT: rasterized primary + traced mirror reflection."""
    pos, quat, scale, opa, feats = random_scene(n=48, seed=4)
    from tests.test_cameras import make_pinhole
    mirror = mesh_mod.make_quad([0.0, 0.0, 5.0], [3.0, 0, 0], [0, 3.0, 0],
                                material_id=0)
    mats = mat_mod.make_materials(
        [dict(kind=mat_mod.MaterialKind.MIRROR, base_color=(1.0, 1.0, 1.0))])
    cfg = eng_mod.EngineConfig(max_bounces=2, candidate_capacity=48)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, mesh=mirror,
                       materials=mats, config=cfg)
    cam = make_pinhole(f=30.0, cx=8.0, cy=8.0)
    out = e.render_hybrid(cam, jnp.eye(4), (16, 16))
    assert out["rgb"].shape == (16, 16, 3)
    assert not bool(out["overflow"])
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # The mirror plane at z=5 bounds primary depth (slanted rays reach
    # up to 5/cos(fov)).
    assert float(out["depth"].max()) <= 6.0


def test_playground_cli_from_ply(tmp_path):
    """playground.py loads a PLY scene and renders a frame headless, and the
    web viewer serves the page + a frame over HTTP."""
    import sys
    sys.path.insert(0, "/root/repo")
    import playground as pg_cli
    from threedgrut_tpu.export.ply import export_ply
    from threedgrut_tpu.model import gaussians as G

    rng = np.random.default_rng(0)
    n = 32
    params = G.from_arrays(
        rng.normal(0, 0.4, (n, 3)).astype(np.float32),
        rng.normal(size=(n, 4)).astype(np.float32),
        np.full((n, 3), np.log(0.1), np.float32),
        np.full((n, 1), 1.0, np.float32),
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        np.zeros((n, 45), np.float32), capacity=32)
    ply_path = str(tmp_path / "scene.ply")
    export_ply(params, ply_path)
    rc = pg_cli.main(["--gs_object", ply_path, "--resolution", "32", "32",
                      "--max_bounces", "1", "--no-serve"])
    assert rc == 0


def test_web_viewer_http(tmp_path):
    import urllib.request
    from threedgrut_tpu.playground.web_viewer import WebViewer
    pos, quat, scale, opa, feats = random_scene(n=24, seed=9, z=0.0)
    cfg = eng_mod.EngineConfig(max_bounces=1, candidate_capacity=24)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, config=cfg)
    viewer = WebViewer(e, resolution=(32, 32))
    server = viewer.serve(port=18321, blocking=False)
    try:
        page = urllib.request.urlopen(
            "http://127.0.0.1:18321/", timeout=30).read()
        assert b"threedgrut_tpu playground" in page
        img = urllib.request.urlopen(
            "http://127.0.0.1:18321/render?yaw=0.5&pitch=0.3&radius=3",
            timeout=60).read()
        assert img[:2] == b"\xff\xd8"  # JPEG magic
    finally:
        server.shutdown()


def test_scene_graph_edits():
    """SceneGraph primitive/material editing rebuilds stacked buffers."""
    from threedgrut_tpu.playground.scene import SceneGraph
    sg = SceneGraph(material_specs=[
        dict(kind=mat_mod.MaterialKind.MIRROR),
        dict(kind=mat_mod.MaterialKind.GLASS, ior=1.33)])
    quad = mesh_mod.make_quad([0, 0, 0], [1, 0, 0], [0, 1, 0])
    sg.add("floor", quad, translation=(0, 0, -1))
    sg.add("floor", quad)                       # name collision -> floor_2
    assert set(sg.primitives) == {"floor", "floor_2"}
    m = sg.mesh()
    assert m.num_faces == 4
    # Transform applies: translated copy sits at z=-1.
    v = np.asarray(m.vertices)
    assert np.isclose(v[:4, 2], -1).all() and np.isclose(v[4:, 2], 0).all()
    # Visibility removes faces from the stack.
    sg.update("floor_2", visible=False)
    assert sg.mesh().num_faces == 2
    # Rotation + scale + material assign.
    sg.update("floor", rotation_euler=(0, 0, np.pi / 2), scale=2.0,
              material_id=1)
    m = sg.mesh()
    assert int(np.asarray(m.material_id)[0]) == 1
    v = np.asarray(m.vertices)
    assert np.isclose(np.abs(v).max(), 2.0, atol=1e-5)   # scaled
    # Duplicate & remove.
    sg.duplicate("floor")
    assert len(sg.primitives) == 3
    sg.remove("floor")
    assert "floor" not in sg.primitives
    # Material edit rebuilds the table.
    sg.set_material(0, base_color=(1.0, 0.0, 0.0), roughness=0.25)
    mats = sg.materials()
    np.testing.assert_allclose(np.asarray(mats.base_color)[0], [1, 0, 0])
    np.testing.assert_allclose(np.asarray(mats.roughness)[0], 0.25)


def test_web_gui_edit_endpoints():
    """The GUI's POST surface: config, preset, material, primitive, traj."""
    import json as json_mod
    import urllib.request
    from threedgrut_tpu.playground.scene import SceneGraph
    from threedgrut_tpu.playground.web_viewer import WebViewer

    pos, quat, scale, opa, feats = random_scene(n=16, seed=3, z=0.0)
    sg = SceneGraph(material_specs=[dict(kind=mat_mod.MaterialKind.MIRROR)])
    sg.add("ball", mesh_mod.make_icosphere([0, 0, 0], 0.4))
    cfg = eng_mod.EngineConfig(max_bounces=1, candidate_capacity=16)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, mesh=sg.mesh(),
                       materials=sg.materials(), config=cfg)
    viewer = WebViewer(e, resolution=(16, 16), scene=sg)
    server = viewer.serve(port=18322, blocking=False)

    def post(path, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:18322{path}",
            data=json_mod.dumps(body).encode(), method="POST")
        return json_mod.loads(urllib.request.urlopen(req, timeout=30).read())

    try:
        st = json_mod.loads(urllib.request.urlopen(
            "http://127.0.0.1:18322/state", timeout=30).read())
        assert "ball" in st["scene"]["primitives"]
        st = post("/config", {"gamma": 2.2, "channel": "density"})
        assert st["config"]["gamma"] == 2.2 and st["channel"] == "density"
        st = post("/preset", {"name": "fast"})
        assert st["config"]["spp"] == 1 and st["config"]["max_bounces"] == 2
        st = post("/material", {"id": 0, "roughness": 0.7})
        assert st["scene"]["materials"][0]["roughness"] == 0.7
        st = post("/primitive", {"name": "ball", "translation": [1, 0, 0]})
        assert st["scene"]["primitives"]["ball"]["translation"][0] == 1.0
        assert float(np.asarray(e.mesh.vertices)[:, 0].mean()) > 0.5
        st = post("/primitive", {"name": "ball", "op": "duplicate"})
        assert len(st["scene"]["primitives"]) == 2
        st = post("/traj", {"op": "add", "yaw": 0.1, "pitch": 0.2,
                            "radius": 3.0})
        assert len(st["trajectory"]) == 1
        # Render still works after edits (density channel).
        img = urllib.request.urlopen(
            "http://127.0.0.1:18322/render?yaw=0.5&pitch=0.3&radius=3",
            timeout=120).read()
        assert img[:2] == b"\xff\xd8"
        # Unknown field -> 400, state unchanged.
        import urllib.error
        try:
            post("/config", {"nope": 1})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as err:
            assert err.code == 400
    finally:
        server.shutdown()


def test_video_trajectory(tmp_path):
    from threedgrut_tpu.playground import video
    from tests.test_cameras import make_pinhole
    pos, quat, scale, opa, feats = random_scene(n=16, seed=12, z=0.0)
    cfg = eng_mod.EngineConfig(max_bounces=1, candidate_capacity=16)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, config=cfg)
    cam = make_pinhole(f=30.0, cx=8.0, cy=8.0)
    traj = video.orbit_trajectory(3, radius=3.0)
    out = video.render_video(e, cam, traj, (16, 16),
                             str(tmp_path / "orbit.mp4"), fps=10)
    import os
    assert os.path.exists(out)
    kf = video.keyframe_trajectory(traj, 5)
    assert len(kf) == 5


def test_training_gui_live(tmp_path):
    """TrainingGUI serves frames rendered from the live trainer params."""
    import urllib.request
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
    from threedgrut_tpu.gui import TrainingGUI
    from threedgrut_tpu.model import gaussians
    from threedgrut_tpu.trainer import Trainer

    ds = SyntheticDataset(num_views=2, resolution=(16, 16),
                          num_gt_gaussians=16, seed=3)
    cfg = Config()
    cfg.render.isect_capacity = 1 << 11
    params = gaussians.init_from_points(np.asarray(ds.scene[0]), capacity=32)
    tr = Trainer(cfg, ds, params=params)
    gui = TrainingGUI(tr, port=18322, resolution=(16, 16))
    try:
        img = urllib.request.urlopen(
            "http://127.0.0.1:18322/render?yaw=0.4&pitch=0.3&radius=4",
            timeout=60).read()
        assert img[:2] == b"\xff\xd8"
        tr.run(iterations=2, log_every=1)
        img2 = urllib.request.urlopen(
            "http://127.0.0.1:18322/render?yaw=0.4&pitch=0.3&radius=4",
            timeout=60).read()
        assert img2[:2] == b"\xff\xd8"
        # Live training-status panel endpoint (step/loss/psnr history).
        import json as _json
        st = _json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18322/train_status", timeout=60).read())
        assert st["step"] == 2 and len(st["history"]) == 2
        assert {"step", "loss", "psnr", "particles",
                "it_s"} <= set(st["history"][0])
        state = _json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18322/state", timeout=60).read())
        assert state["has_training"] is True
    finally:
        gui.close()


def test_denoiser():
    from threedgrut_tpu.playground.denoiser import bilateral_denoise
    rng = np.random.default_rng(0)
    clean = np.zeros((16, 16, 3), np.float32)
    clean[:, 8:] = 1.0  # sharp edge
    noisy = clean + rng.normal(0, 0.1, clean.shape).astype(np.float32)
    depth = np.where(np.arange(16)[None, :] >= 8, 2.0, 1.0).astype(
        np.float32) * np.ones((16, 16), np.float32)
    out = np.asarray(bilateral_denoise(jnp.asarray(noisy),
                                       jnp.asarray(depth)))
    # Noise reduced away from the edge...
    assert np.abs(out[:, :6] - 0).mean() < np.abs(noisy[:, :6] - 0).mean()
    # ...edge preserved (no big bleed across column 8).
    assert out[:, 6].mean() < 0.25 and out[:, 9].mean() > 0.75


def test_atrous_denoiser_quality():
    """SVGF-style a-trous: beats the bilateral on MSE at 1-SPP-like noise
    while keeping a depth edge sharp."""
    from threedgrut_tpu.playground.denoiser import (atrous_denoise,
                                                    bilateral_denoise)
    rng = np.random.default_rng(1)
    clean = np.zeros((32, 32, 3), np.float32)
    clean[:, 16:] = 0.9
    noisy = (clean + rng.normal(0, 0.18, clean.shape)).astype(np.float32)
    depth = np.where(np.arange(32)[None, :] >= 16, 2.0, 1.0).astype(
        np.float32) * np.ones((32, 32), np.float32)
    out_a = np.asarray(atrous_denoise(jnp.asarray(noisy),
                                      jnp.asarray(depth)))
    out_b = np.asarray(bilateral_denoise(jnp.asarray(noisy),
                                         jnp.asarray(depth)))
    mse = lambda x: float(np.mean((x - clean) ** 2))
    assert mse(out_a) < mse(noisy) * 0.25       # strong noise reduction
    assert mse(out_a) < mse(out_b)              # beats the bilateral
    # Depth-guided: edge columns stay separated.
    assert out_a[:, 13].mean() < 0.3 and out_a[:, 18].mean() > 0.6
    # Variance adaptivity: a clean image passes through ~unchanged.
    passthru = np.asarray(atrous_denoise(jnp.asarray(clean),
                                         jnp.asarray(depth)))
    assert np.abs(passthru - clean).max() < 0.08


def test_engine_denoise_flag():
    pos, quat, scale, opa, feats = random_scene(n=16, seed=13)
    from tests.test_cameras import make_pinhole
    cfg = eng_mod.EngineConfig(max_bounces=1, candidate_capacity=16,
                               denoise=True)
    e = eng_mod.Engine(pos, quat, scale, opa, feats, config=cfg)
    cam = make_pinhole(f=30.0, cx=8.0, cy=8.0)
    out = e.render(cam, jnp.eye(4), (16, 16))
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_textured_quad_golden():
    """Texture-mapped diffuse quad through the JITTED engine: left half red,
    right half blue (base-color texture), checked in image space."""
    import numpy as np
    from threedgrut_tpu.playground import materials as mat_mod
    from threedgrut_tpu.playground import mesh as mesh_mod
    from threedgrut_tpu.playground.engine import Engine, EngineConfig

    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = [1.0, 0.0, 0.0]
    tex[:, 4:] = [0.0, 0.0, 1.0]
    mats = mat_mod.make_materials([dict(
        kind=mat_mod.MaterialKind.DIFFUSE, base_color=(1.0, 1.0, 1.0),
        base_color_texture=tex)])
    quad = mesh_mod.make_mesh(
        np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                 np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    pos, quat, scale, opa, feats = random_scene(n=4, seed=1)
    g = (pos, quat, scale, opa * 1e-5, feats)  # effectively empty scene
    eng = Engine(*g, mesh=quad, materials=mats,
                 config=EngineConfig(max_bounces=1, candidate_capacity=256))
    from tests.test_cameras import make_pinhole
    cam = make_pinhole(f=16.0, cx=16.0, cy=16.0)
    import jax.numpy as jnp
    T = jnp.eye(4)
    out = eng.render(cam, T, (32, 32))
    img = np.asarray(out["rgb"])
    # Sample interior points (pixel cols 12/20 -> u=0.25/0.75): the texture
    # edges themselves blend across the seam under wrap addressing (the
    # CUDA-texture / glTF REPEAT default).
    left = img[16, 12]
    right = img[16, 20]
    assert left[0] > 0.2 and left[2] < 0.05, left     # red side
    assert right[2] > 0.2 and right[0] < 0.05, right  # blue side
    # Jit cache: second render with the same static config reuses the trace.
    out2 = eng.render(cam, T, (32, 32))
    np.testing.assert_allclose(np.asarray(out2["rgb"]), img)


def test_normal_map_changes_shading():
    import numpy as np
    from threedgrut_tpu.playground import materials as mat_mod

    flat = np.full((4, 4, 3), [0.5, 0.5, 1.0], np.float32)   # identity map
    tilted = np.full((4, 4, 3), [0.9, 0.5, 0.6], np.float32)  # bent normals
    import jax.numpy as jnp
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    n = jnp.asarray([[0.0, 0.0, -1.0]])
    uv = jnp.asarray([[0.5, 0.5]])
    tangent = jnp.asarray([[1.0, 0.0, 0.0]])
    env = jnp.ones((1, 3))
    outs = []
    for tex in (flat, tilted):
        mats = mat_mod.make_materials([dict(
            kind=mat_mod.MaterialKind.MIRROR, normal_texture=tex)])
        nd, _, _, _ = mat_mod.bounce(mats, jnp.zeros((1,), jnp.int32), d, n,
                                     env, uv=uv, tangent=tangent)
        outs.append(np.asarray(nd))
    np.testing.assert_allclose(outs[0][0], [0.0, 0.0, -1.0], atol=1e-5)
    assert np.abs(outs[1][0] - outs[0][0]).max() > 0.1  # map bent the bounce


def test_glb_roundtrip(tmp_path):
    """Write a minimal GLB (textured triangle pair) and load it back."""
    import json
    import struct
    import numpy as np
    from threedgrut_tpu.playground.gltf import load_glb

    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    binb = pos.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 0.0, 0.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.2, 0.1, 1.0],
            "metallicFactor": 0.3, "roughnessFactor": 0.7}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5125, "count": 6,
             "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 24}],
        "buffers": [{"byteLength": len(binb)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    while len(binb) % 4:
        binb += b"\0"
    total = 12 + 8 + len(js) + 8 + len(binb)
    glb = (struct.pack("<III", 0x46546C67, 2, total)
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(binb), 0x004E4942) + binb)
    path = tmp_path / "test.glb"
    path.write_bytes(glb)

    mesh, mats = load_glb(str(path))
    assert mesh.num_faces == 2
    v = np.asarray(mesh.vertices)
    np.testing.assert_allclose(v[0], [1.0, 0.0, 0.0], atol=1e-6)  # node T
    np.testing.assert_allclose(np.asarray(mesh.uvs), uv)
    np.testing.assert_allclose(np.asarray(mats.base_color)[0],
                               [0.9, 0.2, 0.1], atol=1e-6)
    np.testing.assert_allclose(float(np.asarray(mats.metallic)[0]), 0.3)


def test_web_viewer_raster_mode(tmp_path):
    """Mode 'raster' routes frames through the frame-coherent inference
    path (refresh + compacted frames, render/infer.py): repeated nearby
    requests reuse the compact cache; a large camera jump re-refreshes;
    depth channel works (aux outputs)."""
    import urllib.request
    from threedgrut_tpu.playground.web_viewer import WebViewer
    pos, quat, scale, opa, feats = random_scene(n=24, seed=9, z=0.0)
    e = eng_mod.Engine(pos, quat, scale, opa, feats,
                       config=eng_mod.EngineConfig(max_bounces=1,
                                                   candidate_capacity=24))
    viewer = WebViewer(e, resolution=(32, 32))
    viewer.mode = "raster"
    f0 = viewer.render_frame(0.5, 0.3, 3.0)
    assert viewer._raster_cache is not None and np.isfinite(f0).all()
    assert viewer._raster_cache["frames"] == 0          # refresh frame
    f1 = viewer.render_frame(0.52, 0.3, 3.0)            # small move: cached
    assert viewer._raster_cache["frames"] == 1
    np.testing.assert_allclose(f1.mean(), f0.mean(), atol=0.05)
    viewer.render_frame(1.8, 0.3, 3.0)                  # big jump: refresh
    assert viewer._raster_cache["frames"] == 0
    viewer.channel = "depth"
    d = viewer.render_frame(1.8, 0.3, 3.0)
    assert np.isfinite(d).all()
    # And through the HTTP surface.
    server = viewer.serve(port=18327, blocking=False)
    try:
        img = urllib.request.urlopen(
            "http://127.0.0.1:18327/render?yaw=0.5&pitch=0.3&radius=3",
            timeout=120).read()
        assert img[:2] == b"\xff\xd8"
    finally:
        server.shutdown()
