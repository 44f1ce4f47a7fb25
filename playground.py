#!/usr/bin/env python
"""Interactive playground CLI (reference playground.py surface):
    python playground.py --gs_object ckpt.npz|model.ply|model.ingp \
        [--port 8080] [--mesh_assets dir] [--envmap file.hdr]
Serves a web viewer (no polyscope/viser needed).
"""
from __future__ import annotations

import argparse
import os
import sys


def load_gaussians(path: str):
    """Load a scene from checkpoint (.npz), .ply, or .ingp."""
    from threedgrut_tpu.model.gaussians import Gaussians
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        from threedgrut_tpu.export.ply import import_ply
        return import_ply(path)
    if ext == ".ingp":
        from threedgrut_tpu.export.ingp import import_ingp
        return import_ingp(path)
    if ext == ".npz":
        import dataclasses
        import numpy as np
        import jax.numpy as jnp
        data = np.load(path)
        return Gaussians(**{f.name: jnp.asarray(data[f"params/{f.name}"])
                            for f in dataclasses.fields(Gaussians)})
    raise ValueError(f"unsupported scene format {ext}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gs_object", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--mesh_assets", default=None,
                    help="directory of .obj meshes to insert (glass/mirror)")
    ap.add_argument("--envmap", default=None, help="equirect image file")
    ap.add_argument("--resolution", type=int, nargs=2, default=(400, 400))
    ap.add_argument("--max_bounces", type=int, default=3)
    ap.add_argument("--no-serve", action="store_true",
                    help="render one frame and exit (smoke test)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from threedgrut_tpu.playground import engine as eng_mod
    from threedgrut_tpu.playground import materials as mat_mod
    from threedgrut_tpu.playground import mesh as mesh_mod
    from threedgrut_tpu.playground.scene import SceneGraph
    from threedgrut_tpu.playground.web_viewer import WebViewer

    g = load_gaussians(args.gs_object)
    # Editable scene graph (reference Primitives): each asset file becomes a
    # named primitive; default material table offers mirror + glass.
    sg = SceneGraph(material_specs=[
        dict(kind=mat_mod.MaterialKind.MIRROR, base_color=(0.95,) * 3),
        dict(kind=mat_mod.MaterialKind.GLASS, ior=1.33)])
    if args.mesh_assets and os.path.isdir(args.mesh_assets):
        for i, f in enumerate(sorted(os.listdir(args.mesh_assets))):
            name = os.path.splitext(f)[0]
            if f.endswith(".obj"):
                sg.add(name, mesh_mod.load_obj(
                    os.path.join(args.mesh_assets, f), i % 2))
            elif f.endswith(".glb"):
                from threedgrut_tpu.playground.gltf import load_glb_scene
                glb_mesh, glb_specs = load_glb_scene(
                    os.path.join(args.mesh_assets, f))
                if glb_mesh is None:
                    continue
                off = len(sg.material_specs)
                for spec in glb_specs:
                    sg.add_material(spec)
                sg.add(name, mesh_mod.TriangleMesh(
                    vertices=glb_mesh.vertices, faces=glb_mesh.faces,
                    vertex_normals=glb_mesh.vertex_normals,
                    material_id=glb_mesh.material_id + off,
                    uvs=glb_mesh.uvs,
                    vertex_tangents=glb_mesh.vertex_tangents))
    envmap = None
    if args.envmap:
        from threedgrut_tpu.datasets.native_loader import ImageLoader
        envmap = jnp.asarray(ImageLoader().decode(args.envmap)[..., :3])

    cfg = eng_mod.EngineConfig(max_bounces=args.max_bounces)
    engine = eng_mod.Engine(
        g.get_positions(), g.get_rotation(), g.get_scale(), g.get_density(),
        g.get_features(), mesh=sg.mesh(), materials=sg.materials(),
        envmap=envmap, config=cfg)
    viewer = WebViewer(engine, resolution=tuple(args.resolution), scene=sg)
    if args.no_serve:
        frame = viewer.render_frame(0.6, 0.4, 4.0)
        print(f"rendered {frame.shape}, mean {float(frame.mean()):.4f}",
              flush=True)
        return 0
    viewer.serve(port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
