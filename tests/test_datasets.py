"""Dataset loaders: NeRF-synthetic JSON format and COLMAP binary models,
exercised on synthetic on-disk fixtures."""
import json
import os

import numpy as np
import pytest

from threedgrut_tpu.datasets import colmap, make
from threedgrut_tpu.datasets.dataset_synthetic import orbit_poses


def _save_png(path, arr):
    from PIL import Image
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


@pytest.fixture(scope="module")
def nerf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nerf_scene")
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"./{split}/r_{i}"
            os.makedirs(d / split, exist_ok=True)
            img = rng.uniform(size=(16, 16, 4)).astype(np.float32)
            _save_png(d / split / f"r_{i}.png", img)
            c2w = np.eye(4)
            c2w[:3, 3] = [i * 0.1, 0, 4.0]
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
        with open(d / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(d)


def test_nerf_dataset_shutter_type(nerf_dir):
    """dataset.shutter_type stamps View.shutter + pose_end (VERDICT missing
    #6: the reference drives shutter from sensor metadata,
    threedgut_tracer/tracer.py:138-151)."""
    from threedgrut_tpu.cameras import ShutterType
    ds = make("nerf", nerf_dir, split="train",
              shutter_type="rolling_top_to_bottom")
    v = ds[0]
    assert v.shutter == ShutterType.ROLLING_TOP_TO_BOTTOM
    assert v.pose_end is not None
    np.testing.assert_array_equal(v.pose_end, v.T_to_world)
    # Default stays global with no end pose.
    ds_g = make("nerf", nerf_dir, split="train")
    assert ds_g[0].shutter == ShutterType.GLOBAL
    assert ds_g[0].pose_end is None


def test_nerf_dataset(nerf_dir):
    ds = make("nerf", nerf_dir, split="train")
    assert len(ds) == 4
    v = ds[0]
    assert v.resolution == (16, 16)
    assert v.rgb_gt.shape == (16, 16, 3)
    # Pose convention flip: right-up-back -> right-down-front.
    assert v.T_to_world[1, 1] == -1.0
    assert v.T_to_world[2, 2] == -1.0
    assert ds.scene_extent > 0
    ds_test = make("nerf", nerf_dir, split="test")
    assert len(ds_test) == 2


@pytest.fixture(scope="module")
def colmap_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("colmap_scene")
    os.makedirs(d / "sparse" / "0")
    os.makedirs(d / "images")
    rng = np.random.default_rng(1)
    cams = {1: colmap.ColmapCamera("PINHOLE", 20, 12,
                                   np.array([18.0, 18.0, 10.0, 6.0]))}
    images = {}
    from threedgrut_tpu.cameras import matrix_to_quat
    import jax.numpy as jnp
    for i, T in enumerate(orbit_poses(10, radius=3.0)):
        R_w2c = T[:3, :3].T
        t_w2c = -R_w2c @ T[:3, 3]
        q = np.asarray(matrix_to_quat(jnp.asarray(R_w2c)))
        name = f"img_{i:03d}.png"
        images[i + 1] = colmap.ColmapImage(q.astype(np.float64),
                                           t_w2c.astype(np.float64), 1, name)
        _save_png(d / "images" / name, rng.uniform(size=(12, 20, 3)))
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    colmap.write_cameras_bin(str(d / "sparse/0/cameras.bin"), cams)
    colmap.write_images_bin(str(d / "sparse/0/images.bin"), images)
    colmap.write_points3d_bin(str(d / "sparse/0/points3D.bin"), pts, cols)
    return str(d), pts


def test_colmap_parsers_roundtrip(colmap_dir):
    d, pts = colmap_dir
    cams = colmap.read_cameras_bin(os.path.join(d, "sparse/0/cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 20
    images = colmap.read_images_bin(os.path.join(d, "sparse/0/images.bin"))
    assert len(images) == 10
    xyz, rgb = colmap.read_points3d_bin(
        os.path.join(d, "sparse/0/points3D.bin"))
    np.testing.assert_allclose(xyz, pts, atol=1e-6)
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_colmap_dataset_split_and_views(colmap_dir):
    d, pts = colmap_dir
    train = make("colmap", d, split="train")
    val = make("colmap", d, split="val")
    assert len(train) == 8 and len(val) == 2     # every 8th -> val
    v = train[0]
    assert v.resolution == (20, 12)
    assert v.rgb_gt.shape == (12, 20, 3)
    # Camera->world poses round-trip through the view transform.
    assert np.isfinite(v.T_to_world).all()
    xyz, rgb = train.initialization_points()
    assert xyz.shape == (50, 3)
    assert train.scene_extent > 0


def test_colmap_trains(colmap_dir):
    """COLMAP data flows through the full Trainer."""
    d, pts = colmap_dir
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.model import gaussians
    from threedgrut_tpu.trainer import Trainer

    train = make("colmap", d, split="train")
    cfg = Config()
    cfg.render.isect_capacity = 1 << 12
    xyz, rgb = train.initialization_points()
    params = gaussians.init_from_points(xyz, colors=rgb, capacity=64)
    tr = Trainer(cfg, train, params=params)
    tr.run(iterations=3, log_every=0)
    assert np.isfinite(float(tr.params.positions.sum()))


def test_colmap_per_camera_shutter(tmp_path):
    """Two sensors in ONE dataset carry DIFFERENT shutters (VERDICT r3 task
    6; reference: shutter is per-camera sensor metadata,
    threedgut_tracer/tracer.py:138-151), and the renderer consumes each
    view's own shutter — the rolling-shutter sensor's render moves with the
    pose pair while the global sensor's does not."""
    import jax.numpy as jnp
    from threedgrut_tpu.cameras import (SensorPose, ShutterType,
                                        matrix_to_quat, pose_from_matrix)
    from threedgrut_tpu.datasets.protocols import parse_shutter_spec
    from threedgrut_tpu.render import gut

    d = tmp_path / "two_sensor_rig"
    os.makedirs(d / "sparse" / "0")
    os.makedirs(d / "images")
    rng = np.random.default_rng(3)
    cams = {1: colmap.ColmapCamera("PINHOLE", 20, 12,
                                   np.array([18.0, 18.0, 10.0, 6.0])),
            2: colmap.ColmapCamera("PINHOLE", 20, 12,
                                   np.array([18.0, 18.0, 10.0, 6.0]))}
    images = {}
    for i, T in enumerate(orbit_poses(4, radius=3.0)):
        R_w2c = T[:3, :3].T
        t_w2c = -R_w2c @ T[:3, 3]
        q = np.asarray(matrix_to_quat(jnp.asarray(R_w2c)))
        name = f"img_{i:03d}.png"
        images[i + 1] = colmap.ColmapImage(
            q.astype(np.float64), t_w2c.astype(np.float64),
            1 + (i % 2), name)                     # alternate the two rigs
        _save_png(d / "images" / name, rng.uniform(size=(12, 20, 3)))
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(size=(20, 3)).astype(np.float32)
    colmap.write_cameras_bin(str(d / "sparse/0/cameras.bin"), cams)
    colmap.write_images_bin(str(d / "sparse/0/images.bin"), images)
    colmap.write_points3d_bin(str(d / "sparse/0/points3D.bin"), pts, cols)

    ds = make("colmap", str(d), split="train", test_split_interval=0,
              shutter_type="1:global,2:rolling_top_to_bottom")
    by_cam = {}
    for i in range(len(ds)):
        v = ds[i]
        by_cam[ds.images[i].camera_id] = v
    assert by_cam[1].shutter == ShutterType.GLOBAL
    assert by_cam[1].pose_end is None
    assert by_cam[2].shutter == ShutterType.ROLLING_TOP_TO_BOTTOM
    assert by_cam[2].pose_end is not None       # start==end (no timestamps)

    # The dict/string spec forms agree.
    spec = parse_shutter_spec({1: "global", 2: "rolling_top_to_bottom"})
    assert spec == {1: ShutterType.GLOBAL,
                    2: ShutterType.ROLLING_TOP_TO_BOTTOM}

    # Render each sensor with ITS shutter over a moving pose pair: the
    # rolling sensor's image must move, the global sensor's must not.
    n = 32
    g_pos = rng.normal(0, 0.6, (n, 3)).astype(np.float32)
    g_quat = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    g_scl = np.full((n, 3), 0.15, np.float32)
    g_opa = np.full((n,), 0.8, np.float32)
    g_feat = np.zeros((n, 16, 3), np.float32)
    g_feat[:, 0] = rng.uniform(0.2, 1.0, (n, 3))
    gargs = tuple(jnp.asarray(x) for x in (g_pos, g_quat, g_scl, g_opa,
                                           g_feat))

    def render(view, displace):
        p0 = pose_from_matrix(jnp.asarray(view.T_to_world))
        pose = SensorPose(q_start=p0.q_start, t_start=p0.t_start,
                          q_end=p0.q_start,
                          t_end=p0.t_start + displace)
        out, ovf = gut.render(*gargs, view.camera, pose, view.resolution,
                              2048, shutter=view.shutter,
                              T_to_world=jnp.asarray(view.T_to_world))
        assert not bool(ovf)
        return np.asarray(out.rgb)

    dz = jnp.asarray([0.3, 0.0, 0.0])
    for cam_id, should_move in ((1, False), (2, True)):
        v = by_cam[cam_id]
        a = render(v, jnp.zeros(3))
        b = render(v, dz)
        moved = float(np.abs(a - b).max())
        if should_move:
            assert moved > 1e-3, "rolling sensor must react to the pose pair"
        else:
            assert moved == 0.0, "global sensor must ignore the end pose"


def test_cli_train_and_render(nerf_dir, tmp_path):
    """The two CLI entry points end-to-end on the tiny NeRF fixture."""
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli
    import render as render_cli

    out = str(tmp_path)
    rc = train_cli.main([
        "--config-name", "nerf_synthetic_3dgut",
        f"path={nerf_dir}", f"out_dir={out}", "experiment_name=t",
        "train.iterations=3", "render.isect_capacity=4096",
        "train.val_frequency=0", "model.capacity=2048",
        "strategy.method=none"])
    assert rc == 0
    assert os.path.exists(f"{out}/t/ckpt_last.npz")
    assert os.path.exists(f"{out}/t/export_last.ply")
    rc = render_cli.main([
        "--checkpoint", f"{out}/t/ckpt_last.npz", "--path", nerf_dir,
        "--split", "test", "--out-dir", f"{out}/render"])
    assert rc == 0
    assert os.path.exists(f"{out}/render/pred_0000.png")


def test_synthetic_multi_sensor_views():
    """The acceptance-scene dataset (VERDICT r4 #7): alternating
    pinhole/fisheye sensors, rolling shutter with real end poses on half
    the views, vignette masks on fisheye views — and GT rendered under the
    same models (mean intensity sane, masked pixels black-or-scene)."""
    import numpy as np
    from threedgrut_tpu.cameras import FisheyeCamera, PinholeCamera
    from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset

    ds = SyntheticDataset(num_views=8, resolution=(48, 48),
                          num_gt_gaussians=48, seed=3, multi_sensor=True)
    kinds = [type(ds[i].camera) for i in range(8)]
    assert kinds[0] is PinholeCamera and kinds[1] is FisheyeCamera
    assert int(ds[2].shutter) == 1 and ds[2].pose_end is not None
    assert int(ds[0].shutter) == 0 and ds[0].pose_end is None
    assert ds[1].mask is not None and ds[0].mask is None
    assert ds[1].mask.shape == (48, 48, 1)
    # Rolling end pose differs from the start pose.
    assert not np.allclose(ds[2].pose_end, ds[2].T_to_world)
    for i in range(8):
        assert np.isfinite(ds[i].rgb_gt).all()
        assert ds[i].rgb_gt.mean() > 1e-4
