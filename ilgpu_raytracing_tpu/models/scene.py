"""Scene construction (host, numpy) and the committed device pytree.

The reference mirrors host C# lists into 15 flat device buffers
(reference Scene.cs:19-58, upload :258-279). Here the host side is a
`SceneBuilder` over numpy arrays and `commit()` produces a `SceneData`
pytree of jnp arrays that jitted render functions close over or take as an
argument.

TPU-first layout decisions (differences from the reference's data model are
deliberate and documented):

* Per-triangle vertices are baked to `(v0, e1, e2)` rows at commit -- one
  gather per candidate triangle in the traversal loop instead of three
  index-chased vertex fetches (the reference gathers positions via MeshTri
  indices per test, SceneDeviceViews.cs:188-191). Positions+indices are kept
  host-side for rebuild/refit.
* Triangle UVs are baked per-corner the same way (vs texcoord indirection,
  SceneDeviceViews.cs:201-204).
* Instances are split by BLAS type into two static index lists so the
  traversal can run a sphere pass and a triangle pass without per-lane type
  dispatch (the reference branches on inst.type per thread,
  SceneDeviceViews.cs:54-63).
* Texels are packed uint32 0xAARRGGBB (one gather + bit ops per texel).
* BVH node int fields are packed (left, first, count, skip) into one (N,4)
  int32 array -- a single gather per node step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import struct

from ilgpu_raytracing_tpu.models import bvh as bvh_mod
from ilgpu_raytracing_tpu.models.materials import (
    SHADING_GLASS,
    SHADING_LAMBERT,
    SHADING_MIRROR,
    Material,
    materials_to_soa,
)

BLAS_SPHERE_SET = 1
BLAS_TRI_MESH = 2


def identity_affine() -> np.ndarray:
    """Row-major 3x4 affine identity (Affine3x4.cs:3-15)."""
    return np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]], dtype=np.float32
    )


def translation_affine(t) -> np.ndarray:
    m = identity_affine()
    m[:, 3] = np.asarray(t, dtype=np.float32)
    return m


def scale_affine(s: float, t=(0, 0, 0)) -> np.ndarray:
    m = identity_affine() * np.float32(s)
    m[:, 3] = np.asarray(t, dtype=np.float32)
    return m


def invert_rigid_or_uniform(m: np.ndarray):
    """Invert a rigid + uniform-scale 3x4 affine; returns (inv, uniform_scale)
    (Scene.cs:616-638 semantics: scale = mean of column norms)."""
    cols = [m[:, 0], m[:, 1], m[:, 2]]
    s = float(sum(np.linalg.norm(c) for c in cols)) / 3.0
    inv_s = 1.0 / s if s > 0 else 1.0
    r = np.stack(
        [c / max(1e-30, np.linalg.norm(c)) for c in cols], axis=1
    )  # orthonormalized rotation (columns)
    inv = np.zeros((3, 4), dtype=np.float32)
    inv[:, :3] = r.T * inv_s
    inv[:, 3] = -(inv[:, :3] @ m[:, 3])
    return inv.astype(np.float32), np.float32(s)


def transform_aabb(m: np.ndarray, bmin: np.ndarray, bmax: np.ndarray):
    """World AABB of a transformed AABB via its 8 corners (Scene.cs:560-580)."""
    corners = np.array(
        [
            [bmin[0], bmin[1], bmin[2]],
            [bmax[0], bmin[1], bmin[2]],
            [bmin[0], bmax[1], bmin[2]],
            [bmin[0], bmin[1], bmax[2]],
            [bmax[0], bmax[1], bmin[2]],
            [bmin[0], bmax[1], bmax[2]],
            [bmax[0], bmin[1], bmax[2]],
            [bmax[0], bmax[1], bmax[2]],
        ],
        dtype=np.float32,
    )
    w = corners @ m[:, :3].T + m[:, 3]
    return w.min(axis=0), w.max(axis=0)


@struct.dataclass
class SceneData:
    """Committed device scene: flat SoA jnp arrays (a pytree)."""

    # --- TLAS (skip-index, over instance world AABBs) ---
    tlas_bmin: jnp.ndarray  # (Nt,3) f32
    tlas_bmax: jnp.ndarray  # (Nt,3)
    tlas_ifields: jnp.ndarray  # (Nt,4) i32: left,first,count,skip
    tlas_instance_indices: jnp.ndarray  # (Ni,) i32

    # --- instances (combined storage; type split below) ---
    inst_o2w: jnp.ndarray  # (I,3,4) f32
    inst_w2o: jnp.ndarray  # (I,3,4)
    inst_scale: jnp.ndarray  # (I,) f32 uniform scale of o2w
    inst_bmin: jnp.ndarray  # (I,3) world bounds
    inst_bmax: jnp.ndarray  # (I,3)
    inst_blas_root: jnp.ndarray  # (I,) i32 absolute node index
    inst_prim_first: jnp.ndarray  # (I,) i32 first prim (sphere id / tri id)
    inst_prim_count: jnp.ndarray  # (I,) i32
    sph_instances: jnp.ndarray  # (Is,) i32 indices into combined arrays
    tri_instances: jnp.ndarray  # (It,) i32

    # --- BLAS nodes (all instances concatenated, absolute indices) ---
    blas_bmin: jnp.ndarray  # (Nb,3)
    blas_bmax: jnp.ndarray  # (Nb,3)
    blas_ifields: jnp.ndarray  # (Nb,4) i32

    # --- sphere primitives ---
    sphere_prim_idx: jnp.ndarray  # (Ps,) i32 leaf indirection -> sphere id
    sph_center: jnp.ndarray  # (S,3)
    sph_radius: jnp.ndarray  # (S,)
    sph_albedo: jnp.ndarray  # (S,3)
    sph_shading: jnp.ndarray  # (S,) i32
    sph_ior: jnp.ndarray  # (S,)
    sph_mat: jnp.ndarray  # (S,) i32

    # --- triangle primitives (baked) ---
    tri_prim_idx: jnp.ndarray  # (Pt,) i32 leaf indirection -> global tri id
    tri_v0: jnp.ndarray  # (T,3)
    tri_e1: jnp.ndarray  # (T,3)
    tri_e2: jnp.ndarray  # (T,3)
    tri_uv0: jnp.ndarray  # (T,2)
    tri_uv1: jnp.ndarray  # (T,2)
    tri_uv2: jnp.ndarray  # (T,2)
    tri_mat: jnp.ndarray  # (T,) i32

    # --- materials SoA ---
    mat_kd: jnp.ndarray  # (M,3)
    mat_diffuse_tex: jnp.ndarray  # (M,) i32, -1 = none
    mat_alpha_tex: jnp.ndarray  # (M,) i32
    mat_alpha_cutoff: jnp.ndarray  # (M,)
    mat_two_sided: jnp.ndarray  # (M,) i32
    mat_shading: jnp.ndarray  # (M,) i32
    mat_ior: jnp.ndarray  # (M,)

    # --- texture pool ---
    texels: jnp.ndarray  # (X,) uint32 0xAARRGGBB
    tex_offset: jnp.ndarray  # (K,) i32
    tex_width: jnp.ndarray  # (K,) i32
    tex_height: jnp.ndarray  # (K,) i32

    # --- static metadata (not traced) ---
    has_alpha: bool = struct.field(pytree_node=False, default=False)
    blas_leaf_max: int = struct.field(pytree_node=False, default=4)
    tlas_leaf_max: int = struct.field(pytree_node=False, default=2)

    @property
    def n_spheres(self) -> int:
        return self.sph_center.shape[0]

    @property
    def n_tris(self) -> int:
        return self.tri_v0.shape[0]


@dataclasses.dataclass
class _Instance:
    type: int
    blas_root: int
    blas_node_count: int
    prim_first: int
    prim_count: int
    o2w: np.ndarray
    w2o: np.ndarray
    scale: float
    bmin: np.ndarray
    bmax: np.ndarray
    vertex_first: int = 0  # mesh instances: slice into builder.positions
    vertex_count: int = 0


class SceneBuilder:
    """Host scene assembly + BVH build; `commit()` -> SceneData."""

    def __init__(self, blas_leaf_size: int = 4, tlas_leaf_size: int = 2,
                 bvh_method: str = "median"):
        self.blas_leaf_size = blas_leaf_size
        self.tlas_leaf_size = tlas_leaf_size
        self.bvh_method = bvh_method  # "median" (parity) or "sah" (native)
        # primitives
        self.spheres: list[dict[str, Any]] = []
        self.positions = np.zeros((0, 3), dtype=np.float32)  # mesh verts
        self.tri_indices = np.zeros((0, 3), dtype=np.int32)
        self.tri_uvs = np.zeros((0, 3, 2), dtype=np.float32)  # baked per-corner
        self.tri_mat = np.zeros((0,), dtype=np.int32)
        # materials / textures
        self.materials: list[Material] = []
        self.texels: list[np.ndarray] = []  # uint32 flat blocks
        self.tex_info: list[tuple[int, int, int]] = []  # (offset, w, h)
        self._texel_count = 0
        # acceleration
        self.blas_bmin: list[np.ndarray] = []
        self.blas_bmax: list[np.ndarray] = []
        self.blas_ifields: list[np.ndarray] = []
        self._blas_node_count = 0
        self.sphere_prim_idx: list[np.ndarray] = []
        self._sphere_prim_count = 0
        self.tri_prim_idx: list[np.ndarray] = []
        self._tri_prim_count = 0
        self.instances: list[_Instance] = []

    # ---- materials / textures ----

    def add_material(self, mat: Material) -> int:
        self.materials.append(mat.validate())
        return len(self.materials) - 1

    def add_texture_rgba(self, rgba: np.ndarray) -> int:
        """rgba: (H, W, 4) uint8 -> packed uint32 texel block; returns tex id."""
        h, w = rgba.shape[:2]
        r = rgba[..., 0].astype(np.uint32)
        g = rgba[..., 1].astype(np.uint32)
        b = rgba[..., 2].astype(np.uint32)
        a = rgba[..., 3].astype(np.uint32)
        packed = (a << 24) | (r << 16) | (g << 8) | b
        offset = self._texel_count
        self.texels.append(packed.reshape(-1))
        self._texel_count += w * h
        self.tex_info.append((offset, w, h))
        return len(self.tex_info) - 1

    def add_checker_texture(self, w: int, h: int, step: int, c0, c1) -> int:
        """Procedural checker (Scene.cs:98-112). c0/c1: RGBA uint8 tuples."""
        ys, xs = np.mgrid[0:h, 0:w]
        sel = (((xs // step) + (ys // step)) & 1) == 0
        rgba = np.where(
            sel[..., None],
            np.array(c0, dtype=np.uint8),
            np.array(c1, dtype=np.uint8),
        )
        return self.add_texture_rgba(rgba.astype(np.uint8))

    # ---- primitives ----

    def add_sphere(
        self,
        center,
        radius: float,
        albedo=(1.0, 1.0, 1.0),
        material: int = 0,
        shading: int = SHADING_LAMBERT,
        ior: float = 1.0,
    ) -> int:
        self.spheres.append(
            dict(
                center=np.asarray(center, dtype=np.float32),
                radius=float(radius),
                albedo=np.asarray(albedo, dtype=np.float32),
                material=int(material),
                shading=int(shading),
                ior=float(ior),
            )
        )
        return len(self.spheres) - 1

    # ---- instances ----

    def _append_blas(self, nbmin, nbmax, nif, leaf_order, prim_base_list_len):
        """Offset node indices to absolute positions and append to the global
        node pool; returns (blas_root, node_count, first_offset)."""
        base = self._blas_node_count
        nif = nif.copy()
        inner = nif[:, bvh_mod.LEFT] >= 0
        nif[inner, bvh_mod.LEFT] += base
        skipv = nif[:, bvh_mod.SKIP] >= 0
        nif[skipv, bvh_mod.SKIP] += base
        nif[:, bvh_mod.FIRST] += prim_base_list_len
        self.blas_bmin.append(nbmin)
        self.blas_bmax.append(nbmax)
        self.blas_ifields.append(nif)
        self._blas_node_count += nif.shape[0]
        return base, nif.shape[0]

    def add_sphere_instance(self, sphere_ids, object_to_world=None) -> int:
        """BLAS over a set of spheres + an instance record
        (Scene.cs BuildSphereInstance:323-356)."""
        if object_to_world is None:
            object_to_world = identity_affine()
        o2w = np.asarray(object_to_world, dtype=np.float32)
        ids = np.asarray(sphere_ids, dtype=np.int32)
        centers = np.stack([self.spheres[i]["center"] for i in ids])
        radii = np.array([self.spheres[i]["radius"] for i in ids], dtype=np.float32)
        pbmin, pbmax = bvh_mod.sphere_bounds(centers, radii)
        nbmin, nbmax, nif, order = bvh_mod.build_skip_index_bvh(
            pbmin, pbmax, centers, self.blas_leaf_size, self.bvh_method
        )
        root, count = self._append_blas(
            nbmin, nbmax, nif, order, self._sphere_prim_count
        )
        self.sphere_prim_idx.append(ids[order])
        self._sphere_prim_count += len(order)

        w2o, scale = invert_rigid_or_uniform(o2w)
        wmin, wmax = transform_aabb(o2w, pbmin.min(axis=0), pbmax.max(axis=0))
        self.instances.append(
            _Instance(
                type=BLAS_SPHERE_SET,
                blas_root=root,
                blas_node_count=count,
                prim_first=int(ids[0]),
                prim_count=len(ids),
                o2w=o2w,
                w2o=w2o,
                scale=float(scale),
                bmin=wmin,
                bmax=wmax,
            )
        )
        return len(self.instances) - 1

    def add_mesh_instance(
        self,
        positions: np.ndarray,
        tri_indices: np.ndarray,
        tri_uvs: np.ndarray | None = None,
        tri_mat: np.ndarray | None = None,
        object_to_world: np.ndarray | None = None,
    ) -> int:
        """Append a triangle mesh with base-index fixups and build its BLAS
        (Scene.cs LoadObjInstance:144-256 geometry path).

        positions: (V,3) f32; tri_indices: (T,3) i32 (local);
        tri_uvs: (T,3,2) per-corner texcoords (or None -> zeros);
        tri_mat: (T,) global material indices (or None -> material 0).
        """
        if object_to_world is None:
            object_to_world = identity_affine()
        o2w = np.asarray(object_to_world, dtype=np.float32)
        positions = np.asarray(positions, dtype=np.float32)
        tri_indices = np.asarray(tri_indices, dtype=np.int32)
        T = tri_indices.shape[0]
        if tri_uvs is None:
            tri_uvs = np.zeros((T, 3, 2), dtype=np.float32)
        if tri_mat is None:
            tri_mat = np.zeros((T,), dtype=np.int32)

        def _cat(old, new):
            # concatenating onto an empty array still copies `new`; at 1M
            # tris those copies cost seconds on this host's memory
            # bandwidth, so the first mesh adopts its arrays directly
            return new if old.shape[0] == 0 else np.concatenate([old, new])

        base_vertex = self.positions.shape[0]
        base_tri = self.tri_indices.shape[0]
        self.positions = _cat(self.positions, positions)
        self.tri_indices = _cat(
            self.tri_indices,
            tri_indices if base_vertex == 0 else tri_indices + base_vertex,
        )
        self.tri_uvs = _cat(self.tri_uvs, np.asarray(tri_uvs, dtype=np.float32))
        self.tri_mat = _cat(self.tri_mat, np.asarray(tri_mat, dtype=np.int32))

        v0 = positions[tri_indices[:, 0]]
        v1 = positions[tri_indices[:, 1]]
        v2 = positions[tri_indices[:, 2]]
        pbmin, pbmax = bvh_mod.triangle_bounds(v0, v1, v2)
        centroid = (v0 + v1 + v2) / 3.0
        nbmin, nbmax, nif, order = bvh_mod.build_skip_index_bvh(
            pbmin, pbmax, centroid, self.blas_leaf_size, self.bvh_method
        )
        root, count = self._append_blas(nbmin, nbmax, nif, order, self._tri_prim_count)
        self.tri_prim_idx.append((order + base_tri).astype(np.int32))
        self._tri_prim_count += len(order)

        w2o, scale = invert_rigid_or_uniform(o2w)
        wmin, wmax = transform_aabb(o2w, pbmin.min(axis=0), pbmax.max(axis=0))
        self.instances.append(
            _Instance(
                type=BLAS_TRI_MESH,
                blas_root=root,
                blas_node_count=count,
                prim_first=base_tri,
                prim_count=T,
                o2w=o2w,
                w2o=w2o,
                scale=float(scale),
                bmin=wmin,
                bmax=wmax,
                vertex_first=base_vertex,
                vertex_count=positions.shape[0],
            )
        )
        return len(self.instances) - 1

    # ---- commit ----

    def commit(self) -> SceneData:
        n_inst = len(self.instances)
        assert n_inst > 0, "empty scene"

        inst_bmin = np.stack([i.bmin for i in self.instances])
        inst_bmax = np.stack([i.bmax for i in self.instances])
        centroids = 0.5 * (inst_bmin + inst_bmax)
        t_bmin, t_bmax, t_if, t_order = bvh_mod.build_skip_index_bvh(
            inst_bmin, inst_bmax, centroids, self.tlas_leaf_size
        )

        sph_ids = [i for i, ins in enumerate(self.instances) if ins.type == BLAS_SPHERE_SET]
        tri_ids = [i for i, ins in enumerate(self.instances) if ins.type == BLAS_TRI_MESH]

        def a(x, dtype=np.float32):
            return jnp.asarray(np.asarray(x, dtype=dtype))

        def cat_or_dummy(lst, shape, dtype=np.float32):
            if lst:
                return np.concatenate(lst).astype(dtype)
            return np.zeros(shape, dtype=dtype)

        # spheres SoA (1-element dummies when absent, Scene.cs:370-377)
        if self.spheres:
            sph_center = np.stack([s["center"] for s in self.spheres])
            sph_radius = np.array([s["radius"] for s in self.spheres], np.float32)
            sph_albedo = np.stack([s["albedo"] for s in self.spheres])
            sph_shading = np.array([s["shading"] for s in self.spheres], np.int32)
            sph_ior = np.array([s["ior"] for s in self.spheres], np.float32)
            sph_mat = np.array([s["material"] for s in self.spheres], np.int32)
        else:
            sph_center = np.zeros((1, 3), np.float32)
            sph_radius = np.zeros((1,), np.float32)
            sph_albedo = np.ones((1, 3), np.float32)
            sph_shading = np.zeros((1,), np.int32)
            sph_ior = np.ones((1,), np.float32)
            sph_mat = np.zeros((1,), np.int32)

        if self.tri_indices.shape[0] > 0:
            tv0 = self.positions[self.tri_indices[:, 0]]
            tv1 = self.positions[self.tri_indices[:, 1]]
            tv2 = self.positions[self.tri_indices[:, 2]]
            tri_v0, tri_e1, tri_e2 = tv0, tv1 - tv0, tv2 - tv0
            tri_uv0 = self.tri_uvs[:, 0]
            tri_uv1 = self.tri_uvs[:, 1]
            tri_uv2 = self.tri_uvs[:, 2]
            tri_mat = self.tri_mat
        else:
            tri_v0 = tri_e1 = tri_e2 = np.zeros((1, 3), np.float32)
            tri_uv0 = tri_uv1 = tri_uv2 = np.zeros((1, 2), np.float32)
            tri_mat = np.zeros((1,), np.int32)

        msoa = materials_to_soa(self.materials)
        has_alpha = bool((msoa["mat_alpha_tex"] >= 0).any())

        texels = cat_or_dummy(self.texels, (1,), np.uint32)
        if self.tex_info:
            tex_offset = np.array([t[0] for t in self.tex_info], np.int32)
            tex_width = np.array([t[1] for t in self.tex_info], np.int32)
            tex_height = np.array([t[2] for t in self.tex_info], np.int32)
        else:
            tex_offset = np.zeros((1,), np.int32)
            tex_width = np.zeros((1,), np.int32)
            tex_height = np.zeros((1,), np.int32)

        return SceneData(
            tlas_bmin=a(t_bmin),
            tlas_bmax=a(t_bmax),
            tlas_ifields=a(t_if, np.int32),
            tlas_instance_indices=a(t_order, np.int32),
            inst_o2w=a(np.stack([i.o2w for i in self.instances])),
            inst_w2o=a(np.stack([i.w2o for i in self.instances])),
            inst_scale=a([i.scale for i in self.instances]),
            inst_bmin=a(inst_bmin),
            inst_bmax=a(inst_bmax),
            inst_blas_root=a([i.blas_root for i in self.instances], np.int32),
            inst_prim_first=a([i.prim_first for i in self.instances], np.int32),
            inst_prim_count=a([i.prim_count for i in self.instances], np.int32),
            sph_instances=a(sph_ids if sph_ids else [0], np.int32)
            if sph_ids
            else jnp.zeros((0,), jnp.int32),
            tri_instances=a(tri_ids, np.int32)
            if tri_ids
            else jnp.zeros((0,), jnp.int32),
            blas_bmin=a(cat_or_dummy(self.blas_bmin, (1, 3))),
            blas_bmax=a(cat_or_dummy(self.blas_bmax, (1, 3))),
            blas_ifields=a(cat_or_dummy(self.blas_ifields, (1, 4), np.int32), np.int32),
            sphere_prim_idx=a(cat_or_dummy(self.sphere_prim_idx, (1,), np.int32), np.int32),
            sph_center=a(sph_center),
            sph_radius=a(sph_radius),
            sph_albedo=a(sph_albedo),
            sph_shading=a(sph_shading, np.int32),
            sph_ior=a(sph_ior),
            sph_mat=a(sph_mat, np.int32),
            tri_prim_idx=a(cat_or_dummy(self.tri_prim_idx, (1,), np.int32), np.int32),
            tri_v0=a(tri_v0),
            tri_e1=a(tri_e1),
            tri_e2=a(tri_e2),
            tri_uv0=a(tri_uv0),
            tri_uv1=a(tri_uv1),
            tri_uv2=a(tri_uv2),
            tri_mat=a(tri_mat, np.int32),
            mat_kd=a(msoa["mat_kd"]),
            mat_diffuse_tex=a(msoa["mat_diffuse_tex"], np.int32),
            mat_alpha_tex=a(msoa["mat_alpha_tex"], np.int32),
            mat_alpha_cutoff=a(msoa["mat_alpha_cutoff"]),
            mat_two_sided=a(msoa["mat_two_sided"], np.int32),
            mat_shading=a(msoa["mat_shading"], np.int32),
            mat_ior=a(msoa["mat_ior"]),
            texels=a(texels, np.uint32),
            tex_offset=a(tex_offset, np.int32),
            tex_width=a(tex_width, np.int32),
            tex_height=a(tex_height, np.int32),
            has_alpha=has_alpha,
            blas_leaf_max=self.blas_leaf_size,
            tlas_leaf_max=self.tlas_leaf_size,
        )


def build_default_scene(
    blas_leaf_size: int = 4,
    tlas_leaf_size: int = 2,
    single_instance: bool = False,
) -> tuple[SceneBuilder, SceneData]:
    """The reference default scene: 2 procedural checker textures, 5
    materials, 6 spheres (ground r=1000, red, green, textured, mirror,
    glass ior=1.5), one instance per sphere (Scene.cs:83-142).

    single_instance=True merges all six identity-transform spheres into one
    BLAS/instance -- identical images (instances are all at identity), but
    the traversal's instance scan runs one BLAS walk instead of six
    (a TPU-side win: the scan serializes per-instance while_loops).

    Returns (builder, committed scene) so callers can keep mutating/refitting.
    """
    b = SceneBuilder(blas_leaf_size, tlas_leaf_size)
    checker0 = b.add_checker_texture(
        256, 256, 16, (255, 255, 255, 255), (20, 20, 20, 255)
    )
    checker1 = b.add_checker_texture(
        256, 256, 8, (40, 40, 200, 255), (200, 200, 40, 255)
    )
    m_ground = b.add_material(Material(kd=(1, 1, 1), diffuse_tex=checker0))
    m_red = b.add_material(Material(kd=(0.8, 0.3, 0.3)))
    m_green = b.add_material(Material(kd=(0.3, 0.8, 0.3)))
    m_tex = b.add_material(Material(kd=(1, 1, 1), diffuse_tex=checker1))
    m_white = b.add_material(Material(kd=(1, 1, 1)))

    ground = b.add_sphere((0, -1000.5, 0), 1000.0, (1, 1, 1), m_ground)
    s0 = b.add_sphere((-0.9, 0.5, -0.2), 0.5, (0.8, 0.3, 0.3), m_red)
    s1 = b.add_sphere((0.9, 0.35, 0.2), 0.35, (0.3, 0.8, 0.3), m_green)
    s2 = b.add_sphere((0.0, 0.75, 0.6), 0.75, (1, 1, 1), m_tex)
    s_mirror = b.add_sphere(
        (-1.8, 0.5, 0.8), 0.5, (1, 1, 1), m_white, SHADING_MIRROR
    )
    s_glass = b.add_sphere(
        (1.8, 0.5, -0.8), 0.5, (1, 1, 1), m_white, SHADING_GLASS, ior=1.5
    )
    if single_instance:
        b.add_sphere_instance([ground, s0, s1, s2, s_mirror, s_glass])
    else:
        for sid in (ground, s0, s1, s2, s_mirror, s_glass):
            b.add_sphere_instance([sid])
    return b, b.commit()


def refit_mesh_instance(
    builder: SceneBuilder, scene: SceneData, inst_index: int,
    new_positions: np.ndarray,
) -> SceneData:
    """Per-frame BVH refit for an animated mesh instance (BASELINE config 4).

    Replaces the instance's vertex positions, refits its BLAS bounds
    bottom-up WITHOUT rebuilding topology (the capability the reference's
    RebuildPolicy advertises but never implements, BvhManager.cs:27),
    recomputes baked triangle rows and instance world bounds, rebuilds the
    tiny TLAS, and returns an updated SceneData. The builder's host mirrors
    are updated so refits compound across frames.
    """
    inst = builder.instances[inst_index]
    assert inst.type == BLAS_TRI_MESH, "refit targets mesh instances"
    new_positions = np.asarray(new_positions, dtype=np.float32)
    assert new_positions.shape == (inst.vertex_count, 3)

    v0_slice = slice(inst.vertex_first, inst.vertex_first + inst.vertex_count)
    builder.positions[v0_slice] = new_positions

    t_slice = slice(inst.prim_first, inst.prim_first + inst.prim_count)
    tris = builder.tri_indices[t_slice]
    v0 = builder.positions[tris[:, 0]]
    v1 = builder.positions[tris[:, 1]]
    v2 = builder.positions[tris[:, 2]]
    pbmin, pbmax = bvh_mod.triangle_bounds(v0, v1, v2)

    # refit the instance's node slice (children are absolute; localize)
    root = inst.blas_root
    count = inst.blas_node_count
    nif_all = np.asarray(scene.blas_ifields)
    nif = nif_all[root : root + count].copy()
    inner = nif[:, bvh_mod.LEFT] >= 0
    nif[inner, bvh_mod.LEFT] -= root
    # leaf `first` is absolute into the global tri_prim_idx; map the global
    # tri id back to this instance's local prim row
    leaf_order_global = np.asarray(scene.tri_prim_idx)
    leaf_order_local = leaf_order_global - inst.prim_first
    nb, nx = bvh_mod.refit_bvh(nif, leaf_order_local, pbmin, pbmax)

    wmin, wmax = transform_aabb(inst.o2w, pbmin.min(axis=0), pbmax.max(axis=0))
    inst.bmin, inst.bmax = wmin, wmax

    inst_bmin = np.stack([i.bmin for i in builder.instances])
    inst_bmax = np.stack([i.bmax for i in builder.instances])
    centroids = 0.5 * (inst_bmin + inst_bmax)
    t_bmin, t_bmax, t_if, t_order = bvh_mod.build_skip_index_bvh(
        inst_bmin, inst_bmax, centroids, builder.tlas_leaf_size
    )

    return scene.replace(
        blas_bmin=scene.blas_bmin.at[root : root + count].set(jnp.asarray(nb)),
        blas_bmax=scene.blas_bmax.at[root : root + count].set(jnp.asarray(nx)),
        tri_v0=scene.tri_v0.at[t_slice].set(jnp.asarray(v0)),
        tri_e1=scene.tri_e1.at[t_slice].set(jnp.asarray(v1 - v0)),
        tri_e2=scene.tri_e2.at[t_slice].set(jnp.asarray(v2 - v0)),
        inst_bmin=jnp.asarray(inst_bmin),
        inst_bmax=jnp.asarray(inst_bmax),
        tlas_bmin=jnp.asarray(t_bmin),
        tlas_bmax=jnp.asarray(t_bmax),
        tlas_ifields=jnp.asarray(t_if, jnp.int32),
        tlas_instance_indices=jnp.asarray(t_order, jnp.int32),
    )
