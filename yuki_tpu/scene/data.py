"""Device scene representation: SoA arrays + a host-side builder.

TPU-first redesign of the reference's pointer-heavy scene graph
(``yuki/src/scene/mod.rs:41-49``: Arc<Mesh>/Arc<dyn Shape>/Arc<dyn Light>
trees): everything the integrators touch per-ray lives in flat ``jnp``
arrays so the whole wavefront can gather it —

  * Triangles are pre-transformed to world space at build time (the
    reference does the same inside Mesh::new, yuki/src/shapes/mesh.rs) and
    stored as per-corner position/normal/uv arrays plus per-triangle
    material / area-light / handedness ids.
  * Spheres keep their object<->world matrices (yuki/src/shapes/sphere.rs)
    and are intersected brute-force outside the BVH — sphere counts are tiny
    and a dense [S] test vectorizes better than polymorphic BVH leaves.
    (Divergence from the reference, which BVHs all shapes together.)
  * Materials are a table keyed by integer type id — the reference's
    scratch-allocated trait-object BSDFs (materials/mod.rs:20-27) become
    masked branchless evaluation in bsdf.py.
  * Lights are a table keyed by type id (lights/*.rs).
  * Textures live in one flat texel atlas, point-sampled by gather.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import transforms as tf

# Material type ids (materials/{matte,glass,metal,glossy}.rs)
MAT_MATTE = 0
MAT_GLASS = 1
MAT_METAL = 2
MAT_GLOSSY = 3

# Light type ids (lights/{point,spot,rectangular,distant}_light.rs)
# Below this triangle count the dense broadcast sweep beats BVH gathers on
# TPU by a wide margin (measured ~45x on a v5e for the Cornell box).
DENSE_TRI_THRESHOLD = 4096

LIGHT_POINT = 0
LIGHT_SPOT = 1
LIGHT_RECT = 2
LIGHT_DISTANT = 3


def _register(cls):
    """Register a dataclass of arrays as a JAX pytree."""
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda x: ([getattr(x, n) for n in fields], None),
        lambda _, ch: cls(**dict(zip(fields, ch))),
    )
    return cls


@_register
@dataclass
class TriangleArrays:
    """World-space triangle soup. All [T, ...]; T >= 1 (padded)."""

    p0: Any
    p1: Any
    p2: Any
    n0: Any  # shading normals; garbage when has_ns is False
    n1: Any
    n2: Any
    uv0: Any  # [T,2]
    uv1: Any
    uv2: Any
    has_ns: Any  # [T] bool — mesh had authored normals
    has_uv: Any  # [T] bool — mesh had authored uvs
    swaps_hand: Any  # [T] bool — mesh object_to_world swaps handedness
    material: Any  # [T] i32
    area_light: Any  # [T] i32 (-1 = none)
    # One-gather shading row (surface.make_surface): a single [T,32] f32
    # matrix holding p0,p1,p2 | n0,n1,n2 | uv0,uv1,uv2 | has_ns, swaps,
    # material, area_light (ids stored exactly as small floats).  TPU XLA
    # gathers are expensive per call, so the hot path fetches one wide row
    # instead of 17 narrow ones.
    shading_packed: Any  # [T,32] f32


@_register
@dataclass
class SphereArrays:
    """All [S, ...]; S may be 0."""

    obj_to_world: Any  # [S,4,4]
    world_to_obj: Any  # [S,4,4]
    radius: Any  # [S]
    swaps_hand: Any  # [S] bool
    material: Any  # [S] i32


@_register
@dataclass
class MaterialArrays:
    """Material parameter table, [M, ...].

    Per type the slots mean:
      MATTE : c0=kd          s0=sigma(radians)  tex0=kd tex  tex1=sigma tex
      GLASS : c0=R  c1=T     s0=eta
      METAL : c0=eta c1=k    s0=roughness  remap
      GLOSSY: c0=Rs          s0=roughness  remap
    """

    mtype: Any  # [M] i32
    c0: Any  # [M,3]
    c1: Any  # [M,3]
    s0: Any  # [M]
    remap: Any  # [M] bool
    tex0: Any  # [M] i32 texture id for c0, -1 = constant
    tex1: Any  # [M] i32 texture id for s0 (Texture<f32> sigma,
    # textures/mod.rs:12-16 / matte.rs:22-41), -1 = constant
    # One-gather row: [M,16] f32 — mtype, c0(3), c1(3), s0, remap, tex0,
    # tex1.
    packed: Any


@_register
@dataclass
class LightArrays:
    """Light parameter table, [L, ...]. L >= 1 (a zero-intensity point light
    is padded in for lightless scenes so gathers stay well-formed).

    Slots per type:
      POINT  : p=position         i=intensity
      SPOT   : p=position         i=intensity    m=world_to_light
               cos_w=cos(total_width) cos_f=cos(falloff_start)
      RECT   : i=radiance  m=sample_to_world  area=size.x*size.y
      DISTANT: p=direction w      i=radiance
    """

    ltype: Any  # [L] i32
    p: Any  # [L,3]
    i: Any  # [L,3]
    m: Any  # [L,4,4]
    area: Any  # [L]
    cos_w: Any  # [L]
    cos_f: Any  # [L]


@_register
@dataclass
class TextureAtlas:
    """Flat texel pool; per-texture offset/size. Point-sampled, repeat-wrap,
    y-flip (textures/image_texture.rs:85-106)."""

    texels: Any  # [N,3] f32 (at least 1)
    offset: Any  # [K] i32
    width: Any  # [K] i32
    height: Any  # [K] i32
    # [N,3] u8 integer pool, present only when every texel is exactly
    # k/255 (8-bit sources).  The fully-fused path kernel
    # (ops/path_fused.py) fetches texels on the MXU as an exact one-hot
    # select of these integers (u8 ints are exact in bf16), killing the
    # per-lane XLA gather; f32-valued pools keep the gather path.
    texels_u8: Any = None
    # Palette companion, present when the u8 pool has <= 128 distinct
    # RGB triples (procedural/tiled sources routinely do): pal_idx [N]
    # i32 palette index per texel + palette [P,3] f32 INTEGER u8 color
    # values.  The fused path kernel then selects a 1-row palette index
    # on the MXU (3x less MXU + colmask work than the 3-channel select)
    # and resolves RGB with one tiny one-hot dot.
    pal_idx: Any = None
    palette: Any = None


@_register
@dataclass
class SceneData:
    """The full device-resident scene pytree handed to integrators."""

    tris: TriangleArrays
    spheres: SphereArrays
    materials: MaterialArrays
    lights: LightArrays
    textures: TextureAtlas
    bvh: Any  # bvh.BvhArrays
    treelets: Any  # treelets.TreeletArrays | None (large scenes only)
    chunks: Any  # treelets.TreeletArrays | None: flat ~128-tri BVH cut for
    # the incidence-stream traversal (ops/trace_stream.py); supers == chunks
    background: Any  # [3]
    world_lo: Any  # [3] scene AABB (bvh.bounds() parity for debug rays)
    world_hi: Any  # [3]


@dataclass
class SceneMeta:
    """Host-side static facts about the scene (not traced)."""

    name: str = "scene"
    n_tris: int = 0
    n_spheres: int = 0
    n_lights: int = 0
    n_materials: int = 0
    # Python-side light info needed at trace time (counts/types are static).
    light_types: tuple = ()
    # Static max primitives per BVH leaf (unroll bound for leaf tests).
    bvh_max_leaf: int = 4
    # Traversal strategy chosen at build: "dense" broadcast sweep for small
    # scenes (gather-free, VPU-bound), "bvh" threaded traversal otherwise.
    traversal: str = "dense"
    # Static material facts for trace-time specialization: integrators and
    # bsdf eval skip whole lobe families the scene never uses.
    material_types: tuple = (0,)
    has_sigma: bool = False
    has_textures: bool = False
    # Any matte binds a Texture<f32> sigma (textures/mod.rs:12-16); the
    # extra per-lane sigma gather is dropped at trace time otherwise.
    has_sigma_tex: bool = False
    # Static slot-stream pair budgets per ray (ops/trace_stream mult):
    # estimated at build time from sampled diffuse-bounce chunk incidence
    # so open scenes (atrium: mean 6.4) don't overflow the budget into
    # the slow fallback walk while tight ones don't overpay for capacity.
    # The stream runs the tight tier and lax.conds up to the wide one
    # only for waves that actually demand it (_estimate_slot_mult).
    slot_mult: int = 6
    slot_mult_tight: int = 4
    # Divergent-engine shape knobs (ops/trace_bundles.py): rays per
    # bundle and candidate cap per bundle, separately for closest-hit
    # and occlusion queries.  Default 1 = per-ray slot stream.  The
    # CPU-calibrated bundle defaults (B=4 closest / B=8 any) measured
    # 3.2x/1.6x SLOWER than the per-ray stream on-chip (343/170 vs
    # 108/108 ms per 262k-ray bounce call, r3_bundle_stages.py): the
    # bundle merge scatters narrow [*, bun] rows (the slow scalar
    # path) and the OR-amplified kernel work exceeds what the shared
    # extraction saves.  Bundles remain available for experiments.
    bun_closest: int = 1
    c_closest: int = 64
    bun_any: int = 1
    c_any: int = 96
    # Every sphere's material binds no texture (static fact for the fused
    # shading kernels, which skip sphere UV).  MUST live here, not be
    # probed from device arrays: the round-3 gate np.asarray'd traced
    # scene arrays inside jit, silently disabling the fused path for
    # every sphere scene in production (round-4 finding).
    sphere_mats_untextured: bool = True
    # Texture-pool statics for the fully-fused path kernel's MXU texel
    # select (ops/path_fused.py): total texel count (pre-padding) and
    # whether every texel is exactly representable as k/255.
    texpool_texels: int = 1
    texpool_u8_exact: bool = False
    # Distinct RGB triples in the u8 pool when <= 128 (palette texel
    # select in ops/path_fused.py), else 0.
    texpool_palette: int = 0
    n_textures: int = 0


@dataclass
class Scene:
    """Host wrapper: device arrays + static metadata + host BVH for
    visualization/bounds queries."""

    data: SceneData
    meta: SceneMeta
    bvh_host: Any = None  # bvh.BvhHost, for node_bounds(level) etc.

    @property
    def name(self) -> str:
        return self.meta.name


def _estimate_slot_mult(chunks, tri_p, n_sample: int = 8192,
                        seed: int = 17) -> tuple[int, int]:
    """Sampled diffuse-bounce chunk incidence -> static slot budgets.

    Host-side numpy: random surface points with cosine-ish hemisphere
    directions slab-tested against every chunk AABB (the same exact cull
    trace_stream uses).  Returns (tight, wide): the wide budget is
    mean * 1.3 + 2 so p95-ish waves still fit (clamped [6, 16]); the
    tight budget is mean * 0.66 + 1 (clamped [4, wide]) — real bounce
    waves measure well under the sampled mean (3.45 vs 5.4 on the
    colonnade; surviving paths concentrate on visible surfaces), and the
    slot stream lax.conds between the tiers per wave, so a tight miss
    costs one spill, not a fallback."""
    cb = np.asarray(chunks.treelet_bounds)
    rng = np.random.default_rng(seed)
    nt = tri_p.shape[0]
    ids = rng.integers(0, nt, n_sample)
    u = rng.random((n_sample, 1)).astype(np.float32)
    v = (rng.random((n_sample, 1)) * (1 - u)).astype(np.float32)
    p0, p1, p2 = tri_p[ids, 0], tri_p[ids, 1], tri_p[ids, 2]
    orig = p0 + u * (p1 - p0) + v * (p2 - p0)
    nrm = np.cross(p1 - p0, p2 - p0)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    dirs = rng.standard_normal((n_sample, 3)).astype(np.float32)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    flip = (dirs * nrm).sum(1, keepdims=True) < 0
    dirs = np.where(flip, -dirs, dirs).astype(np.float32)
    orig = (orig + 1e-3 * nrm).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / dirs
        t0 = (cb[None, :, 0:3] - orig[:, None, :]) * inv[:, None, :]
        t1 = (cb[None, :, 3:6] - orig[:, None, :]) * inv[:, None, :]
    tn = np.nan_to_num(np.minimum(t0, t1), nan=-np.inf).max(axis=2)
    tf = np.nan_to_num(np.maximum(t0, t1), nan=np.inf).min(axis=2)
    mean_inc = float((np.maximum(tn, 0.0) <= tf).sum(axis=1).mean())
    wide = int(np.clip(np.ceil(mean_inc * 1.3) + 2, 6, 16))
    tight = int(np.clip(np.ceil(mean_inc * 0.66) + 1, 4, wide))
    return tight, wide


class SceneBuilder:
    """Accumulates host-side geometry then freezes into SceneData.

    Plays the role of the reference's loaders filling Scene
    (scene/mod.rs, scene/pbrt/, scene/mitsuba/, scene/ply.rs).
    """

    def __init__(self, name: str = "scene"):
        self.name = name
        self._tri_p = []  # [3,3] per tri
        self._tri_n = []
        self._tri_uv = []
        self._tri_flags = []  # (has_ns, has_uv, swaps_hand)
        self._tri_mat = []
        self._tri_light = []
        self._spheres = []  # (o2w 4x4, w2o 4x4, radius, swaps, mat)
        self._materials = []  # dict rows
        self._lights = []  # dict rows
        self._textures = []  # np [h,w,3] f32
        self.background = np.zeros(3, dtype=np.float32)

    # --- materials -----------------------------------------------------
    def _add_material(self, row) -> int:
        self._materials.append(row)
        return len(self._materials) - 1

    def add_matte(self, kd=(1.0, 1.0, 1.0), sigma: float = 0.0, kd_tex: int = -1,
                  sigma_tex: int = -1) -> int:
        return self._add_material(
            dict(mtype=MAT_MATTE, c0=kd, c1=(0, 0, 0), s0=sigma, remap=False,
                 tex0=kd_tex, tex1=sigma_tex)
        )

    def add_glass(self, r=(1.0, 1.0, 1.0), t=(1.0, 1.0, 1.0), eta: float = 1.5) -> int:
        return self._add_material(
            dict(mtype=MAT_GLASS, c0=r, c1=t, s0=eta, remap=False, tex0=-1, tex1=-1)
        )

    def add_metal(self, eta, k, roughness: float, remap_roughness: bool = True) -> int:
        return self._add_material(
            dict(mtype=MAT_METAL, c0=eta, c1=k, s0=roughness, remap=remap_roughness, tex0=-1, tex1=-1)
        )

    def add_glossy(self, rs, roughness: float, remap_roughness: bool = True) -> int:
        return self._add_material(
            dict(mtype=MAT_GLOSSY, c0=rs, c1=(0, 0, 0), s0=roughness, remap=remap_roughness, tex0=-1, tex1=-1)
        )

    # --- textures ------------------------------------------------------
    def add_texture(self, image: np.ndarray) -> int:
        """image: [h,w,3] float32 linear RGB."""
        assert image.ndim == 3 and image.shape[2] == 3
        self._textures.append(np.asarray(image, dtype=np.float32))
        return len(self._textures) - 1

    # --- lights --------------------------------------------------------
    def add_point_light(self, light_to_world: tf.Transform, intensity) -> int:
        self._lights.append(
            dict(
                ltype=LIGHT_POINT,
                p=light_to_world.apply_p((0.0, 0.0, 0.0)),
                i=intensity,
                m=tf.IDENTITY,
                area=0.0,
                cos_w=0.0,
                cos_f=0.0,
            )
        )
        return len(self._lights) - 1

    def add_spot_light(
        self, light_to_world: tf.Transform, intensity,
        total_width_deg: float, falloff_start_deg: float,
    ) -> int:
        self._lights.append(
            dict(
                ltype=LIGHT_SPOT,
                p=light_to_world.apply_p((0.0, 0.0, 0.0)),
                i=intensity,
                m=light_to_world.m_inv,  # world_to_light
                area=0.0,
                cos_w=np.cos(np.radians(total_width_deg)),
                cos_f=np.cos(np.radians(falloff_start_deg)),
            )
        )
        return len(self._lights) - 1

    def add_rect_light(self, light_to_world: tf.Transform, radiance, size_xy) -> int:
        """Rect area light facing -Y (lights/rectangular_light.rs:23-46)."""
        sx, sy = np.asarray(size_xy, dtype=np.float32)
        sample_to_light = tf.scale(sx, 1.0, sy) @ tf.translation((-0.5, 0.0, -0.5))
        s2w = light_to_world @ sample_to_light
        self._lights.append(
            dict(
                ltype=LIGHT_RECT,
                p=(0.0, 0.0, 0.0),
                i=radiance,
                m=s2w.m,
                area=float(sx * sy),
                cos_w=0.0,
                cos_f=0.0,
            )
        )
        return len(self._lights) - 1

    def add_distant_light(self, radiance, w) -> int:
        self._lights.append(
            dict(
                ltype=LIGHT_DISTANT,
                p=np.asarray(w, dtype=np.float32),
                i=radiance,
                m=tf.IDENTITY,
                area=0.0,
                cos_w=0.0,
                cos_f=0.0,
            )
        )
        return len(self._lights) - 1

    # --- geometry ------------------------------------------------------
    def add_mesh(
        self,
        object_to_world: tf.Transform,
        indices,
        points,
        normals=None,
        uvs=None,
        material: int = 0,
        area_light: int = -1,
    ) -> None:
        """Add all triangles of an indexed mesh (pre-transformed to world
        space like Mesh::new, yuki/src/shapes/mesh.rs:20-44).

        Fully vectorized: whole-mesh matrix transform + fancy-index corner
        gather, so Sponza-class meshes load in milliseconds on one core.
        """
        idx = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
        n_tri = idx.shape[0]
        if n_tri == 0:
            return
        pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
        m = object_to_world.m
        w = pts @ m[3, :3].T + m[3, 3]
        pts_w = (pts @ m[:3, :3].T + m[:3, 3]).astype(np.float32)
        if not np.allclose(w, 1.0):
            pts_w = (pts_w / w[:, None]).astype(np.float32)
        has_ns = normals is not None and len(normals) > 0
        has_uv = uvs is not None and len(uvs) > 0
        if has_ns:
            nrm = np.asarray(normals, dtype=np.float32).reshape(-1, 3)
            nrm_w = (nrm @ object_to_world.m_inv[:3, :3]).astype(np.float32)
            tri_n = nrm_w[idx]  # [T,3,3]
        else:
            tri_n = np.zeros((n_tri, 3, 3), np.float32)
        if has_uv:
            uvarr = np.asarray(uvs, dtype=np.float32).reshape(-1, 2)
            tri_uv = uvarr[idx]
        else:
            # Default triangle uvs (shapes/triangle.rs:139-145).
            tri_uv = np.broadcast_to(
                np.array([[0, 0], [1, 0], [1, 1]], dtype=np.float32),
                (n_tri, 3, 2),
            ).copy()
        swaps = object_to_world.swaps_handedness()
        self._tri_p.append(pts_w[idx])
        self._tri_n.append(tri_n)
        self._tri_uv.append(tri_uv)
        self._tri_flags.append(
            np.broadcast_to(
                np.asarray([has_ns, has_uv, swaps], dtype=bool), (n_tri, 3)
            ).copy()
        )
        self._tri_mat.append(np.full(n_tri, material, dtype=np.int32))
        self._tri_light.append(np.full(n_tri, area_light, dtype=np.int32))

    def add_sphere(self, object_to_world: tf.Transform, radius: float, material: int) -> None:
        self._spheres.append(
            (
                object_to_world.m,
                object_to_world.m_inv,
                float(radius),
                object_to_world.swaps_handedness(),
                int(material),
            )
        )

    # --- freeze --------------------------------------------------------
    def build(
        self,
        split_method: str = "sah",
        max_shapes_in_node: int = 1,
        max_leaf_size: int = 4,
    ) -> Scene:
        from .. import bvh as bvh_mod

        nt = sum(chunk.shape[0] for chunk in self._tri_p)
        ns = len(self._spheres)

        if nt == 0:
            # Pad one degenerate triangle so array shapes stay valid.
            self._tri_p.append(np.full((1, 3, 3), np.inf, dtype=np.float32))
            self._tri_n.append(np.zeros((1, 3, 3), np.float32))
            self._tri_uv.append(np.zeros((1, 3, 2), np.float32))
            self._tri_flags.append(np.zeros((1, 3), dtype=bool))
            self._tri_mat.append(np.zeros(1, dtype=np.int32))
            self._tri_light.append(np.full(1, -1, dtype=np.int32))

        tri_p = np.concatenate(self._tri_p)  # [T,3,3]
        tri_n = np.concatenate(self._tri_n)
        tri_uv = np.concatenate(self._tri_uv)
        flags = np.concatenate(self._tri_flags)
        tri_mat_np = np.concatenate(self._tri_mat)
        tri_light_np = np.concatenate(self._tri_light)
        t_count = tri_p.shape[0]
        packed = np.zeros((t_count, 32), dtype=np.float32)
        packed[:, 0:9] = tri_p.reshape(t_count, 9)
        packed[:, 9:18] = tri_n.reshape(t_count, 9)
        packed[:, 18:24] = tri_uv.reshape(t_count, 6)
        packed[:, 24] = flags[:, 0]  # has_ns
        packed[:, 25] = flags[:, 2]  # swaps_hand
        packed[:, 26] = tri_mat_np
        packed[:, 27] = tri_light_np
        tris = TriangleArrays(
            p0=jnp.asarray(tri_p[:, 0]),
            p1=jnp.asarray(tri_p[:, 1]),
            p2=jnp.asarray(tri_p[:, 2]),
            n0=jnp.asarray(tri_n[:, 0]),
            n1=jnp.asarray(tri_n[:, 1]),
            n2=jnp.asarray(tri_n[:, 2]),
            uv0=jnp.asarray(tri_uv[:, 0]),
            uv1=jnp.asarray(tri_uv[:, 1]),
            uv2=jnp.asarray(tri_uv[:, 2]),
            has_ns=jnp.asarray(flags[:, 0]),
            has_uv=jnp.asarray(flags[:, 1]),
            swaps_hand=jnp.asarray(flags[:, 2]),
            material=jnp.asarray(tri_mat_np),
            area_light=jnp.asarray(tri_light_np),
            shading_packed=jnp.asarray(packed),
        )

        if ns:
            o2w = np.stack([s[0] for s in self._spheres])
            w2o = np.stack([s[1] for s in self._spheres])
            rad = np.asarray([s[2] for s in self._spheres], dtype=np.float32)
            ssw = np.asarray([s[3] for s in self._spheres], dtype=bool)
            smat = np.asarray([s[4] for s in self._spheres], dtype=np.int32)
        else:
            o2w = np.zeros((0, 4, 4), np.float32)
            w2o = np.zeros((0, 4, 4), np.float32)
            rad = np.zeros((0,), np.float32)
            ssw = np.zeros((0,), bool)
            smat = np.zeros((0,), np.int32)
        spheres = SphereArrays(
            obj_to_world=jnp.asarray(o2w),
            world_to_obj=jnp.asarray(w2o),
            radius=jnp.asarray(rad),
            swaps_hand=jnp.asarray(ssw),
            material=jnp.asarray(smat),
        )

        mats = self._materials or [
            dict(mtype=MAT_MATTE, c0=(1, 1, 1), c1=(0, 0, 0), s0=0.0, remap=False, tex0=-1, tex1=-1)
        ]
        mat_packed = np.zeros((len(mats), 16), dtype=np.float32)
        mat_packed[:, 0] = [m["mtype"] for m in mats]
        mat_packed[:, 1:4] = np.asarray([m["c0"] for m in mats], np.float32)
        mat_packed[:, 4:7] = np.asarray([m["c1"] for m in mats], np.float32)
        mat_packed[:, 7] = [m["s0"] for m in mats]
        mat_packed[:, 8] = [float(m["remap"]) for m in mats]
        mat_packed[:, 9] = [m["tex0"] for m in mats]
        mat_packed[:, 10] = [m.get("tex1", -1) for m in mats]
        materials = MaterialArrays(
            mtype=jnp.asarray([m["mtype"] for m in mats], dtype=jnp.int32),
            c0=jnp.asarray(np.asarray([m["c0"] for m in mats], dtype=np.float32)),
            c1=jnp.asarray(np.asarray([m["c1"] for m in mats], dtype=np.float32)),
            s0=jnp.asarray([m["s0"] for m in mats], dtype=jnp.float32),
            remap=jnp.asarray([m["remap"] for m in mats], dtype=bool),
            tex0=jnp.asarray([m["tex0"] for m in mats], dtype=jnp.int32),
            tex1=jnp.asarray([m.get("tex1", -1) for m in mats], dtype=jnp.int32),
            packed=jnp.asarray(mat_packed),
        )

        lrows = self._lights or [
            dict(ltype=LIGHT_POINT, p=(0, 0, 0), i=(0, 0, 0), m=tf.IDENTITY,
                 area=0.0, cos_w=0.0, cos_f=0.0)
        ]
        lights = LightArrays(
            ltype=jnp.asarray([l["ltype"] for l in lrows], dtype=jnp.int32),
            p=jnp.asarray(np.asarray([l["p"] for l in lrows], dtype=np.float32)),
            i=jnp.asarray(np.asarray([l["i"] for l in lrows], dtype=np.float32)),
            m=jnp.asarray(np.stack([np.asarray(l["m"], np.float32) for l in lrows])),
            area=jnp.asarray([l["area"] for l in lrows], dtype=jnp.float32),
            cos_w=jnp.asarray([l["cos_w"] for l in lrows], dtype=jnp.float32),
            cos_f=jnp.asarray([l["cos_f"] for l in lrows], dtype=jnp.float32),
        )

        if self._textures:
            offs, ws, hs, flat = [], [], [], []
            off = 0
            for img in self._textures:
                h, w, _ = img.shape
                offs.append(off)
                ws.append(w)
                hs.append(h)
                flat.append(img.reshape(-1, 3))
                off += h * w
            texels = np.concatenate(flat, axis=0)
        else:
            offs, ws, hs = [0], [1], [1]
            texels = np.zeros((1, 3), np.float32)
        # Exact-u8 pool companion for the MXU texel select (see
        # TextureAtlas.texels_u8): decided from the VALUES, not the
        # source format, so procedurally-built float textures that
        # happen to be 8-bit-exact also qualify.
        u8r = np.clip(np.round(texels * 255.0), 0, 255).astype(np.uint8)
        u8_exact = bool(
            np.array_equal(u8r.astype(np.float32) / np.float32(255.0),
                           texels)
        )
        # Palette: tiled/procedural sources routinely quantize to a few
        # dozen distinct colors (Cornell's 1K tiling: 97 of 65536).
        pal_colors = 0
        pal_idx = palette = None
        if u8_exact:
            uniq, inv = np.unique(u8r, axis=0, return_inverse=True)
            if uniq.shape[0] <= 128:
                pal_colors = int(uniq.shape[0])
                pal_idx = jnp.asarray(inv.astype(np.int32))
                palette = jnp.asarray(uniq.astype(np.float32))
        textures = TextureAtlas(
            texels=jnp.asarray(texels),
            offset=jnp.asarray(offs, dtype=jnp.int32),
            width=jnp.asarray(ws, dtype=jnp.int32),
            height=jnp.asarray(hs, dtype=jnp.int32),
            texels_u8=jnp.asarray(u8r) if u8_exact else None,
            pal_idx=pal_idx,
            palette=palette,
        )

        # BVH over triangles (spheres brute-forced separately).
        bvh_host = bvh_mod.build_bvh(
            tri_p,
            split_method=split_method,
            max_shapes_in_node=max_shapes_in_node,
            max_leaf_size=max_leaf_size,
        )
        # Large scenes additionally get the two-level treelet structure for
        # the Pallas block-traversal kernels (treelets.py).
        treelet_arrays = None
        chunk_arrays = None
        if nt > DENSE_TRI_THRESHOLD:
            from ..treelets import build_treelets

            treelet_arrays = build_treelets(
                bvh_host,
                tri_p,
                np.concatenate(self._tri_light),
                # Fat leaves keep bounce-wave candidate-pair counts inside
                # the SMEM prefetch budget (ops/trace_pairs.py); dense
                # in-leaf tests are cheap on the VPU.
                leaf_size=64,
                super_size=4096,
            )
            # Flat ~128-tri chunk cut for the exact-incidence stream
            # traversal: one level (supers == chunks), fat leaves so the
            # per-ray candidate list stays short (mean ~3 on the
            # colonnade) while in-chunk dense tests stay VPU-cheap.
            chunk_arrays = build_treelets(
                bvh_host,
                tri_p,
                np.concatenate(self._tri_light),
                leaf_size=128,
                super_size=128,
            )
            slot_mult_tight, slot_mult = _estimate_slot_mult(
                chunk_arrays, tri_p)
        world_lo = bvh_host.node_lo[0].copy()
        world_hi = bvh_host.node_hi[0].copy()
        for s in self._spheres:
            # Extend world bounds by sphere AABBs.
            t = tf.Transform(np.asarray(s[0]), np.asarray(s[1]))
            r = s[2]
            corners = np.array(
                [[x, y, z] for x in (-r, r) for y in (-r, r) for z in (-r, r)],
                dtype=np.float32,
            )
            wc = np.stack([t.apply_p(c) for c in corners])
            world_lo = np.minimum(world_lo, wc.min(axis=0))
            world_hi = np.maximum(world_hi, wc.max(axis=0))

        data = SceneData(
            tris=tris,
            spheres=spheres,
            materials=materials,
            lights=lights,
            textures=textures,
            bvh=bvh_host.to_device(),
            treelets=treelet_arrays,
            chunks=chunk_arrays,
            background=jnp.asarray(self.background),
            world_lo=jnp.asarray(world_lo),
            world_hi=jnp.asarray(world_hi),
        )
        meta = SceneMeta(
            name=self.name,
            n_tris=nt,
            n_spheres=ns,
            n_lights=len(lrows) if self._lights else 0,
            n_materials=len(mats),
            light_types=tuple(int(l["ltype"]) for l in lrows) if self._lights else (),
            material_types=tuple(sorted({int(m["mtype"]) for m in mats})),
            has_sigma=any(
                (float(m["s0"]) != 0.0 or int(m.get("tex1", -1)) >= 0)
                and m["mtype"] == MAT_MATTE
                for m in mats
            ),
            has_textures=any(int(m["tex0"]) >= 0 for m in mats),
            has_sigma_tex=any(int(m.get("tex1", -1)) >= 0 for m in mats),
            slot_mult=slot_mult if nt > DENSE_TRI_THRESHOLD else 6,
            slot_mult_tight=(slot_mult_tight
                             if nt > DENSE_TRI_THRESHOLD else 4),
            bvh_max_leaf=bvh_host.max_leaf,
            traversal="dense" if nt <= DENSE_TRI_THRESHOLD else "treelet",
            sphere_mats_untextured=all(
                int(mats[s[4]]["tex0"]) < 0
                and int(mats[s[4]].get("tex1", -1)) < 0
                for s in self._spheres
            ),
            texpool_texels=int(texels.shape[0]),
            texpool_u8_exact=u8_exact,
            texpool_palette=pal_colors,
            n_textures=len(self._textures),
        )
        return Scene(data=data, meta=meta, bvh_host=bvh_host)
