"""Triangle meshes for the playground path tracer.

Reference role: threedgrut_playground builds a second OptiX BVH over mesh
triangles (hybridTracer.cpp:129-209) and intersects via hardware closest-hit.
TPU-native: batched Moller-Trumbore over (rays x triangles) in chunks — a
dense VPU-friendly formulation that is exact for the modest mesh sizes the
playground uses (glass/mirror props). A simple OBJ loader covers the
reference's mesh-asset path (utils/mesh_io).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleMesh:
    vertices: jnp.ndarray   # [V, 3]
    faces: jnp.ndarray      # [F, 3] int32
    vertex_normals: jnp.ndarray  # [V, 3]
    material_id: jnp.ndarray     # [F] int32
    uvs: jnp.ndarray             # [V, 2] texture coordinates
    vertex_tangents: jnp.ndarray  # [V, 3] (UV-aligned, for normal mapping)

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]


def _vertex_tangents(v, f, vn, uv):
    """Per-vertex tangents from UV derivatives (reference: mesh tangents fed
    to materials.cuh normal mapping), orthogonalized against the normal."""
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    du1 = uv[f[:, 1]] - uv[f[:, 0]]
    du2 = uv[f[:, 2]] - uv[f[:, 0]]
    det = du1[:, 0] * du2[:, 1] - du2[:, 0] * du1[:, 1]
    r = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    tan_f = (e1 * du2[:, 1:2] - e2 * du1[:, 1:2]) * r[:, None]
    vt = np.zeros_like(v)
    for k in range(3):
        np.add.at(vt, f[:, k], tan_f)
    # Gram-Schmidt against the vertex normal; fall back to an arbitrary
    # frame where UVs are degenerate.
    vt = vt - vn * np.sum(vt * vn, -1, keepdims=True)
    bad = np.linalg.norm(vt, axis=-1) < 1e-8
    alt = np.cross(vn, np.where(np.abs(vn[:, 2:3]) < 0.9,
                                [[0.0, 0.0, 1.0]], [[1.0, 0.0, 0.0]]))
    vt = np.where(bad[:, None], alt, vt)
    return vt / np.maximum(np.linalg.norm(vt, axis=-1, keepdims=True), 1e-12)


def make_mesh(vertices: np.ndarray, faces: np.ndarray,
              material_id: int = 0, uvs: Optional[np.ndarray] = None,
              normals: Optional[np.ndarray] = None,
              material_ids: Optional[np.ndarray] = None) -> TriangleMesh:
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int32)
    if normals is None:
        # Area-weighted vertex normals.
        e1 = v[f[:, 1]] - v[f[:, 0]]
        e2 = v[f[:, 2]] - v[f[:, 0]]
        fn = np.cross(e1, e2)
        vn = np.zeros_like(v)
        for k in range(3):
            np.add.at(vn, f[:, k], fn)
        norms = np.linalg.norm(vn, axis=-1, keepdims=True)
        vn = vn / np.maximum(norms, 1e-12)
    else:
        vn = np.asarray(normals, np.float32)
    uv = (np.zeros((v.shape[0], 2), np.float32) if uvs is None
          else np.asarray(uvs, np.float32))
    vt = _vertex_tangents(v, f, vn, uv)
    mid = (np.full((f.shape[0],), material_id, np.int32)
           if material_ids is None else np.asarray(material_ids, np.int32))
    return TriangleMesh(
        vertices=jnp.asarray(v), faces=jnp.asarray(f),
        vertex_normals=jnp.asarray(vn),
        material_id=jnp.asarray(mid),
        uvs=jnp.asarray(uv), vertex_tangents=jnp.asarray(vt))


def merge_meshes(meshes) -> TriangleMesh:
    vs, fs, ns, ms, uvs, ts = [], [], [], [], [], []
    off = 0
    for m in meshes:
        vs.append(np.asarray(m.vertices))
        fs.append(np.asarray(m.faces) + off)
        ns.append(np.asarray(m.vertex_normals))
        ms.append(np.asarray(m.material_id))
        uvs.append(np.asarray(m.uvs))
        ts.append(np.asarray(m.vertex_tangents))
        off += m.vertices.shape[0]
    return TriangleMesh(
        vertices=jnp.asarray(np.concatenate(vs)),
        faces=jnp.asarray(np.concatenate(fs)),
        vertex_normals=jnp.asarray(np.concatenate(ns)),
        material_id=jnp.asarray(np.concatenate(ms)),
        uvs=jnp.asarray(np.concatenate(uvs)),
        vertex_tangents=jnp.asarray(np.concatenate(ts)))


def load_obj(path: str, material_id: int = 0) -> TriangleMesh:
    """Minimal OBJ loader: v / f lines (triangulates fans)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                idx = [int(w.split("/")[0]) - 1 for w in t[1:]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return make_mesh(np.asarray(verts, np.float32),
                     np.asarray(faces, np.int32), material_id)


# ---------------------------------------------------------------------------
# Primitive generators (reference: playground assets + utils)
# ---------------------------------------------------------------------------

def make_quad(center, u, v, material_id=0) -> TriangleMesh:
    c = np.asarray(center, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    verts = np.stack([c - u - v, c + u - v, c + u + v, c - u + v])
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return make_mesh(verts, faces, material_id)


def make_icosphere(center, radius, subdivisions=1, material_id=0):
    phi = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdivisions):
        mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                m = m / np.linalg.norm(m)
                mid[key] = len(verts)
                verts.append(m)
            return mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.asarray(verts)
    verts = np.asarray(verts, np.float32) * radius + np.asarray(
        center, np.float32)
    return make_mesh(verts, faces.astype(np.int32), material_id)


class MeshHit(NamedTuple):
    t: jnp.ndarray          # [R] hit distance (inf = miss)
    face: jnp.ndarray       # [R] int32 face index (-1 = miss)
    normal: jnp.ndarray     # [R, 3] interpolated shading normal
    material_id: jnp.ndarray  # [R] int32 (-1 = miss)
    bary: jnp.ndarray       # [R, 2] barycentric (u, v)
    uv: jnp.ndarray         # [R, 2] interpolated texture coordinates
    tangent: jnp.ndarray    # [R, 3] interpolated tangent (normal mapping)


def intersect(mesh: Optional[TriangleMesh], rays_o: jnp.ndarray,
              rays_d: jnp.ndarray, t_min: float = 1e-4,
              chunk: int = 4096) -> MeshHit:
    """Closest-hit over all triangles (Moller-Trumbore), chunked over faces."""
    r = rays_o.shape[0]
    if mesh is None or mesh.num_faces == 0:
        return MeshHit(t=jnp.full((r,), jnp.inf),
                       face=jnp.full((r,), -1, jnp.int32),
                       normal=jnp.zeros((r, 3)),
                       material_id=jnp.full((r,), -1, jnp.int32),
                       bary=jnp.zeros((r, 2)),
                       uv=jnp.zeros((r, 2)),
                       tangent=jnp.zeros((r, 3)))

    v = mesh.vertices
    f = mesh.faces
    nf = mesh.num_faces
    n_chunks = -(-nf // chunk)
    pad = n_chunks * chunk - nf
    f_pad = jnp.concatenate([f, jnp.zeros((pad, 3), jnp.int32)], axis=0)
    valid_f = jnp.concatenate([jnp.ones((nf,), bool),
                               jnp.zeros((pad,), bool)])

    def body(carry, ci):
        best_t, best_face, best_uv = carry
        fc = jax.lax.dynamic_slice(f_pad, (ci * chunk, 0), (chunk, 3))
        vf = jax.lax.dynamic_slice(valid_f, (ci * chunk,), (chunk,))
        p0 = v[fc[:, 0]]
        e1 = v[fc[:, 1]] - p0
        e2 = v[fc[:, 2]] - p0
        # rays [R, 1, 3] x tris [1, F, 3]
        h = jnp.cross(rays_d[:, None, :], e2[None, :, :])
        a = jnp.sum(e1[None] * h, axis=-1)
        safe_a = jnp.where(jnp.abs(a) > 1e-9, a, 1.0)
        inv_a = 1.0 / safe_a
        s = rays_o[:, None, :] - p0[None]
        u = jnp.sum(s * h, axis=-1) * inv_a
        q = jnp.cross(s, e1[None, :, :])
        w = jnp.sum(rays_d[:, None, :] * q, axis=-1) * inv_a
        t = jnp.sum(e2[None] * q, axis=-1) * inv_a
        ok = ((jnp.abs(a) > 1e-9) & (u >= 0) & (w >= 0) & (u + w <= 1)
              & (t > t_min) & vf[None, :])
        t = jnp.where(ok, t, jnp.inf)
        arg = jnp.argmin(t, axis=-1)
        tmin_c = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        u_c = jnp.take_along_axis(u, arg[:, None], axis=-1)[:, 0]
        w_c = jnp.take_along_axis(w, arg[:, None], axis=-1)[:, 0]
        face_c = ci * chunk + arg
        better = tmin_c < best_t
        best_t = jnp.where(better, tmin_c, best_t)
        best_face = jnp.where(better, face_c, best_face)
        best_uv = jnp.where(better[:, None],
                            jnp.stack([u_c, w_c], -1), best_uv)
        return (best_t, best_face, best_uv), None

    init = (jnp.full((r,), jnp.inf), jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r, 2)))
    (best_t, best_face, best_uv), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks))

    hitf = jnp.clip(best_face, 0, nf - 1)
    fidx = f[hitf]
    n0 = mesh.vertex_normals[fidx[:, 0]]
    n1 = mesh.vertex_normals[fidx[:, 1]]
    n2 = mesh.vertex_normals[fidx[:, 2]]
    uu, ww = best_uv[:, 0:1], best_uv[:, 1:2]
    normal = n0 * (1 - uu - ww) + n1 * uu + n2 * ww
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    w0_ = 1 - uu - ww
    tex_uv = (mesh.uvs[fidx[:, 0]] * w0_ + mesh.uvs[fidx[:, 1]] * uu
              + mesh.uvs[fidx[:, 2]] * ww)
    tangent = (mesh.vertex_tangents[fidx[:, 0]] * w0_
               + mesh.vertex_tangents[fidx[:, 1]] * uu
               + mesh.vertex_tangents[fidx[:, 2]] * ww)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12)
    miss = ~jnp.isfinite(best_t)
    return MeshHit(
        t=best_t,
        face=jnp.where(miss, -1, best_face),
        normal=jnp.where(miss[:, None], 0.0, normal),
        material_id=jnp.where(miss, -1, mesh.material_id[hitf]),
        bary=best_uv,
        uv=tex_uv,
        tangent=tangent,
    )
