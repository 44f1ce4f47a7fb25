"""Dataset factory (reference: threedgrut/datasets/__init__.py:21-68)."""
from __future__ import annotations


def make(name: str, path: str, split: str = "train", **kw):
    if name in ("nerf", "nerf_synthetic", "blender"):
        from threedgrut_tpu.datasets.dataset_nerf import NeRFDataset
        return NeRFDataset(path, split=split,
                           downsample_factor=kw.get("downsample_factor", 1),
                           bg_color=kw.get("bg_color"),
                           shutter_type=kw.get("shutter_type", "global"))
    if name == "colmap":
        from threedgrut_tpu.datasets.dataset_colmap import ColmapDataset
        return ColmapDataset(
            path, split=split,
            downsample_factor=kw.get("downsample_factor", 1),
            test_split_interval=kw.get("test_split_interval", 8),
            shutter_type=kw.get("shutter_type", "global"))
    if name == "scannetpp":
        from threedgrut_tpu.datasets.dataset_colmap import ScannetppDataset
        return ScannetppDataset(
            path, split=split,
            downsample_factor=kw.get("downsample_factor", 1),
            test_split_interval=kw.get("test_split_interval", 8),
            shutter_type=kw.get("shutter_type", "global"))
    if name == "synthetic":
        import inspect
        from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
        accepted = set(inspect.signature(SyntheticDataset).parameters)
        return SyntheticDataset(**{k: v for k, v in kw.items()
                                   if k in accepted})
    raise ValueError(f"unknown dataset type {name!r}")
