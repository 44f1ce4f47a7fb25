"""Worker for the 2-process multi-host test (see test_multihost.py).

Each process owns 2 virtual CPU devices; the 4 global devices form a
(data=2, tile=2) mesh whose data axis spans the two PROCESSES — so
`multihost.host_local_batch` really assembles cross-process global arrays
and the DP step's psum rides the Gloo cross-process collectives.
Run: python tests/multihost_worker.py <process_id> <port>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    from threedgrut_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    from threedgrut_tpu import optimizers
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
    from threedgrut_tpu.model import gaussians
    from threedgrut_tpu.parallel import dp

    res = (32, 32)  # 2x2 tiles
    mesh = multihost.make_global_mesh(tile_parallel=2)  # data=2 across procs
    assert mesh.shape["data"] == 2

    # Same seed on both hosts -> same dataset; each host loads only ITS
    # data-axis views (multihost.my_view_indices slices the global schedule).
    ds = SyntheticDataset(num_views=4, resolution=res, num_gt_gaussians=32,
                          seed=11)
    rows = multihost.my_view_indices(num_views=4, batch_size=2, step=0)
    assert len(rows) == 1
    views = [ds[i] for i in rows]
    local = {
        "Ts": np.stack([np.asarray(v.T_to_world) for v in views]),
        "gts": np.stack([np.asarray(v.rgb_gt) for v in views]),
        "cams": jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[v.camera for v in views]),
    }
    gbatch = multihost.host_local_batch(mesh, local)

    pts = np.asarray(ds.scene[0]) + np.random.default_rng(1).normal(
        0, 0.05, ds.scene[0].shape).astype(np.float32)
    params = gaussians.init_from_points(pts, capacity=64)
    cfg = Config()
    cfg.render.isect_capacity = 1 << 12
    cfg.model.background_color = "black"
    step = dp.make_dp_train_step(cfg, mesh, res, sh_degree=3)

    params = dp.replicate(params, mesh)
    opt = dp.replicate(optimizers.init(params), mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    keys = jax.device_put(
        keys, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            "data")))

    new_params, new_opt, metrics = step(params, opt, gbatch["Ts"],
                                        gbatch["cams"], gbatch["gts"], keys,
                                        jnp.float32(ds.scene_extent))
    jax.block_until_ready(new_params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    # Params must stay fully replicated: every process reads the same value.
    pos0 = float(jnp.sum(new_params.positions))
    print(f"MHOK pid={pid} loss={loss:.8f} possum={pos0:.6f}", flush=True)


if __name__ == "__main__":
    main()
