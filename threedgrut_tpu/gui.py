"""Live training viewer: serve the web viewer against a running Trainer.

Reference role: threedgrut/utils/gui.py (polyscope training GUI — live render
view during optimization). Here the dependency-free web viewer renders the
trainer's CURRENT parameters on every frame request, so a browser shows the
scene sharpening as training progresses.

    trainer = Trainer(...)
    gui = TrainingGUI(trainer)      # serves on :8080 in a daemon thread
    trainer.run(...)
"""
from __future__ import annotations

from typing import Optional, Tuple


class _TrainerEngineProxy:
    """Engine-shaped adapter that rebuilds render inputs from the live
    trainer parameters on every call."""

    def __init__(self, trainer, candidate_capacity: int = 1024):
        from threedgrut_tpu.playground.engine import EngineConfig
        self.trainer = trainer
        self.capacity = candidate_capacity
        self.cfg = EngineConfig()   # GUI panel state (gamma etc. unused here)
        self.mesh = None
        self.materials = None

    def render(self, cam, T_to_world, resolution, key=None):
        from threedgrut_tpu.cameras import pose_from_matrix
        from threedgrut_tpu.render import gut
        p = self.trainer.params
        pose = pose_from_matrix(T_to_world)
        out, _ = gut.render(
            p.get_positions(), p.get_rotation(), p.get_scale(),
            p.get_density(), p.get_features(), cam, pose, resolution,
            self.trainer.cfg.render.isect_capacity,
            sh_degree=self.trainer.active_sh_degree(),
            T_to_world=T_to_world)
        return {"rgb": out.rgb, "opacity": out.opacity, "depth": out.depth}

    def render_hybrid(self, cam, T_to_world, resolution, key=None):
        return self.render(cam, T_to_world, resolution, key)

    render_hybrid_jit = render_hybrid


class TrainingGUI:
    def __init__(self, trainer, port: int = 8080,
                 resolution: Tuple[int, int] = (400, 400),
                 target=(0.0, 0.0, 0.0)):
        from threedgrut_tpu.playground.web_viewer import WebViewer

        def status():
            return dict(step=trainer.global_step,
                        history=list(trainer.history))

        self.viewer = WebViewer(_TrainerEngineProxy(trainer),
                                resolution=resolution, target=target,
                                status_fn=status)
        self.server = self.viewer.serve(port=port, blocking=False)

    def close(self):
        self.server.shutdown()
