"""MixtureOfGaussians parameter store as a JAX pytree with capacity padding.

Reference semantics: threedgrut/model/model.py:45-767 — the six parameter
tensors, their activations, and initialization (random point cloud, points
with kNN scale, PLY, checkpoint).

TPU-native design decision: instead of reallocating tensors when densification
changes N (which would retrace/recompile every jitted function), parameters
live in fixed-capacity buffers [capacity, ...] with a boolean `alive` mask.
Dead/padding particles have opacity forced to exactly 0, so they are culled by
the same alpha threshold the reference uses and contribute nothing to images
or gradients. Densification (strategy/) mutates the buffers and mask in place
functionally; capacity growth (rare) is the only shape change.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.constants import SH_C0
from threedgrut_tpu.ops import quaternion


def sh_degree_to_num_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def sh_degree_to_specular_dim(deg: int) -> int:
    return (sh_degree_to_num_coeffs(deg) - 1) * 3


def rgb_to_sh(rgb):
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh):
    return sh * SH_C0 + 0.5


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Gaussians:
    """Raw (pre-activation) parameters. All arrays share leading dim = capacity.

    positions: [C, 3] world means
    rotation:  [C, 4] unnormalized wxyz quaternions
    scale:     [C, 3] log-scales
    density:   [C, 1] pre-sigmoid opacity
    features_albedo:   [C, 3] SH degree-0 coefficients
    features_specular: [C, (K-1)*3] higher-order SH, layout [coeff, channel]
    alive:     [C] bool mask of real particles
    """
    positions: jnp.ndarray
    rotation: jnp.ndarray
    scale: jnp.ndarray
    density: jnp.ndarray
    features_albedo: jnp.ndarray
    features_specular: jnp.ndarray
    alive: jnp.ndarray

    # ---- static info ----
    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = self.features_specular.shape[1] // 3 + 1
        deg = int(np.sqrt(k)) - 1
        assert (deg + 1) ** 2 == k, f"bad specular dim {self.features_specular.shape}"
        return deg

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    # ---- activations (reference: model.py:163-167) ----
    def get_positions(self) -> jnp.ndarray:
        return self.positions

    def get_rotation(self) -> jnp.ndarray:
        return quaternion.normalize(self.rotation)

    def get_scale(self) -> jnp.ndarray:
        return jnp.exp(self.scale)

    def get_density(self) -> jnp.ndarray:
        """Post-activation opacity [C]; exactly 0 for dead particles."""
        return jax.nn.sigmoid(self.density[:, 0]) * self.alive.astype(
            self.density.dtype)

    def get_features(self) -> jnp.ndarray:
        """All SH coefficients as [C, K, 3]."""
        c = self.capacity
        spec = self.features_specular.reshape(c, -1, 3)
        return jnp.concatenate([self.features_albedo[:, None, :], spec], axis=1)

    def replace(self, **kw) -> "Gaussians":
        return dataclasses.replace(self, **kw)


def _pad(arr: np.ndarray, capacity: int, fill: float = 0.0) -> np.ndarray:
    n = arr.shape[0]
    if n > capacity:
        raise ValueError(f"{n} particles exceed capacity {capacity}")
    out = np.full((capacity,) + arr.shape[1:], fill, dtype=np.float32)
    out[:n] = arr
    return out


def round_capacity(n: int, granule: int = 4096) -> int:
    return max(granule, -(-n // granule) * granule)


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def from_arrays(
    positions: np.ndarray,
    rotation: np.ndarray,
    scale: np.ndarray,
    density: np.ndarray,
    features_albedo: np.ndarray,
    features_specular: np.ndarray,
    capacity: Optional[int] = None,
) -> Gaussians:
    n = positions.shape[0]
    cap = capacity or round_capacity(n)
    alive = np.zeros(cap, bool)
    alive[:n] = True
    return Gaussians(
        positions=jnp.asarray(_pad(positions, cap)),
        rotation=jnp.asarray(_pad(rotation, cap)).at[n:, 0].set(1.0),
        scale=jnp.asarray(_pad(scale, cap)),
        density=jnp.asarray(_pad(density, cap, fill=-15.0)),
        features_albedo=jnp.asarray(_pad(features_albedo, cap)),
        features_specular=jnp.asarray(_pad(features_specular, cap)),
        alive=jnp.asarray(alive),
    )


def init_random(
    num_gaussians: int,
    max_sh_degree: int = 3,
    xyz_min: float = -1.5,
    xyz_max: float = 1.5,
    default_density: float = 0.1,
    default_scale_factor: float = 1.0,
    seed: int = 0,
    capacity: Optional[int] = None,
) -> Gaussians:
    """Random point cloud in a box (reference model.py:368-436): uniform
    positions, albedo in [0, 1/255], scale from 1-NN distance, w=1 rotations."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(xyz_min, xyz_max,
                      size=(num_gaussians, 3)).astype(np.float32)
    color = rng.uniform(0, 1.0 / 255.0, size=(num_gaussians, 3)).astype(np.float32)
    dist = np.maximum(nearest_neighbor_dist(pts), 1e-3)
    scales = np.log(dist * default_scale_factor)[:, None].repeat(3, 1)
    rots = rng.uniform(0, 1, size=(num_gaussians, 4)).astype(np.float32)
    rots[:, 0] = 1.0
    density = np.full((num_gaussians, 1),
                      inverse_sigmoid(default_density), np.float32)
    spec = np.zeros((num_gaussians, sh_degree_to_specular_dim(max_sh_degree)),
                    np.float32)
    return from_arrays(pts, rots, scales.astype(np.float32), density, color,
                       spec, capacity)


def init_from_points(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    observer_points: Optional[np.ndarray] = None,
    observation_scale_factor: float = 0.01,
    max_sh_degree: int = 3,
    default_density: float = 0.1,
    default_scale_factor: float = 1.0,
    seed: int = 0,
    capacity: Optional[int] = None,
) -> Gaussians:
    """COLMAP-style init (reference model.py:438-489): scale from distance to
    observers (or 3-NN mean), albedo = RGB2SH(color), random rotations."""
    rng = np.random.default_rng(seed)
    n = points.shape[0]
    if observer_points is not None:
        d = nearest_neighbor_dist(points.astype(np.float32),
                                  observer_points.astype(np.float32))
        obs_scale = np.maximum(d, 1e-7) * observation_scale_factor
    else:
        d2 = k_nearest_neighbors(points.astype(np.float32), 4)[:, 1:] ** 2
        obs_scale = np.sqrt(d2.mean(-1))
    obs_scale = obs_scale * default_scale_factor
    scales = np.log(obs_scale)[:, None].repeat(3, 1).astype(np.float32)
    rots = rng.uniform(0, 1, size=(n, 4)).astype(np.float32)
    if colors is None:
        colors = rng.integers(0, 256, size=(n, 3)).astype(np.float32) / 255.0
    else:
        colors = colors.astype(np.float32)
        if colors.max() > 1.0:
            colors = colors / 255.0
    albedo = rgb_to_sh(colors).astype(np.float32)
    density = np.full((n, 1), inverse_sigmoid(default_density), np.float32)
    spec = np.zeros((n, sh_degree_to_specular_dim(max_sh_degree)), np.float32)
    return from_arrays(points.astype(np.float32), rots, scales, density,
                       albedo, spec, capacity)


def nearest_neighbor_dist(points: np.ndarray,
                          targets: Optional[np.ndarray] = None) -> np.ndarray:
    """Distance to nearest (other) point via a CPU KD-tree
    (reference: threedgrut/model/geometry.py:24-103)."""
    from scipy.spatial import cKDTree
    if targets is None:
        tree = cKDTree(points)
        d, _ = tree.query(points, k=2)
        return d[:, 1].astype(np.float32)
    tree = cKDTree(targets)
    d, _ = tree.query(points, k=1)
    return d.astype(np.float32)


def k_nearest_neighbors(points: np.ndarray, k: int) -> np.ndarray:
    from scipy.spatial import cKDTree
    tree = cKDTree(points)
    d, _ = tree.query(points, k=k)
    return d.astype(np.float32)
