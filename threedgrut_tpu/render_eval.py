"""Evaluation renderer: render a test split from a checkpoint, save images,
compute PSNR/SSIM/LPIPS.

Reference semantics: threedgrut/render.py — `Renderer.from_checkpoint`
applies the eval overrides (3DGRT: density clamping + min_transmittance 0.03,
render.py:88-91), renders every test view, saves PNGs, reports per-image and
mean PSNR/SSIM/LPIPS and the best/worst frames. LPIPS runs on host via
torchmetrics (TPU keeps the render; the metric is eval-only).
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from threedgrut_tpu import constants as C
from threedgrut_tpu.trainer import Trainer


def _to_uint8(img) -> np.ndarray:
    # np.asarray first: datasets may hand out device-resident (jax) GT
    # arrays, which PIL's Image.fromarray cannot consume.
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


class _LPIPS:
    """Lazy torchmetrics LPIPS on host CPU; disabled if unavailable."""

    def __init__(self):
        self._fn = None
        self.available = True

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float:
        if not self.available:
            return float("nan")
        try:
            if self._fn is None:
                import torch
                from torchmetrics.image.lpip import (
                    LearnedPerceptualImagePatchSimilarity)
                self._fn = (LearnedPerceptualImagePatchSimilarity(
                    net_type="vgg", normalize=True), torch)
            metric, torch = self._fn
            a = torch.from_numpy(np.ascontiguousarray(
                pred.transpose(2, 0, 1)))[None].float()
            b = torch.from_numpy(np.ascontiguousarray(
                gt.transpose(2, 0, 1)))[None].float()
            return float(metric(a.clamp(0, 1), b.clamp(0, 1)))
        except Exception:
            self.available = False
            return float("nan")


class Renderer:
    def __init__(self, trainer: Trainer, dataset):
        self.trainer = trainer
        self.dataset = dataset

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, dataset) -> "Renderer":
        trainer = Trainer.load_checkpoint(checkpoint_path, dataset=None)
        # Eval overrides (reference render.py:88-91).
        if trainer.cfg.render.method == "3dgrt":
            trainer.cfg.render.min_transmittance = \
                C.MIN_TRANSMITTANCE_3DGRT_EVAL
            trainer.cfg.render.particle_kernel_density_clamping = True
        trainer.dataset = dataset
        trainer.scene_extent = float(dataset.scene_extent)
        return cls(trainer, dataset)

    def render_all(self, out_dir: Optional[str] = None, save_gt: bool = False,
                   compute_lpips: bool = True) -> Dict[str, float]:
        from threedgrut_tpu.model import losses as loss_mod
        import jax.numpy as jnp

        lpips = _LPIPS() if compute_lpips else None
        rows: List[Dict[str, float]] = []
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        times = []
        n_ovf = 0
        for i in range(len(self.dataset)):
            view = self.dataset[i]
            t0 = time.perf_counter()
            aux = self.trainer.eval_view(view)
            pred = np.asarray(aux["pred"])
            times.append(time.perf_counter() - t0)
            if bool(aux["overflow"]):
                n_ovf += 1
                print(f"WARNING: eval view {i} overflowed isect capacity "
                      f"{self.trainer.isect_capacity}; image is truncated",
                      flush=True)
            gt = view.rgb_gt
            row = {
                "psnr": float(aux["psnr"]),
                "ssim": float(loss_mod.ssim(jnp.asarray(pred),
                                            jnp.asarray(gt))),
            }
            if lpips is not None:
                row["lpips"] = lpips(pred, gt)
            rows.append(row)
            if out_dir:
                from PIL import Image
                Image.fromarray(_to_uint8(pred)).save(
                    os.path.join(out_dir, f"pred_{i:04d}.png"))
                if save_gt:
                    Image.fromarray(_to_uint8(gt)).save(
                        os.path.join(out_dir, f"gt_{i:04d}.png"))

        psnrs = [r["psnr"] for r in rows]
        best_i, worst_i = int(np.argmax(psnrs)), int(np.argmin(psnrs))
        if out_dir:
            # Best/worst PSNR pred+gt pairs (reference render.py:149-283).
            from PIL import Image
            for tag, idx in (("best", best_i), ("worst", worst_i)):
                view = self.dataset[idx]
                aux = self.trainer.eval_view(view)
                Image.fromarray(_to_uint8(np.asarray(aux["pred"]))).save(
                    os.path.join(out_dir, f"{tag}_psnr_pred_{idx:04d}.png"))
                Image.fromarray(_to_uint8(np.asarray(view.rgb_gt))).save(
                    os.path.join(out_dir, f"{tag}_psnr_gt_{idx:04d}.png"))
        summary = {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean([r["ssim"] for r in rows])),
            "best_psnr_idx": best_i,
            "worst_psnr_idx": worst_i,
            "mean_render_s": float(np.mean(times[1:])) if len(times) > 1
            else float(times[0]),
            "n_frames": len(rows),
            "overflow_views": n_ovf,
        }
        lp = [r.get("lpips", float("nan")) for r in rows]
        if not np.all(np.isnan(lp)):
            summary["lpips"] = float(np.nanmean(lp))
        return summary
