"""pbrt-v3 scene export logic, Blender-independent.

Everything here operates on "bpy-shaped" objects (duck-typed: the real
bpy data blocks in Blender, tests/fake_bpy.py fixtures in CI), so the
exporter unit-tests without a Blender install.  Matrix math is done in
numpy from plain nested lists rather than mathutils.

Behavior parity with the reference add-on
(/root/reference/pbrt_blender/export.py):
  - camera: LookAt eye/target/up with the Blender(Z-up) -> pbrt(Y-up)
    coordinate swap (x, z, y), fov resolved against sensor fit + aspect
    (export.py:91-128)
  - halton sampler / path integrator / Film header (export.py:131-139)
  - world Background node -> infinite light (export.py:144-161)
  - POINT -> point light, SUN -> distant, both with I = energy*color/3pi
    (export.py:207-231)
  - meshes split per material slot, loop-vertex dedup with smooth/flat
    normals, winding flipped to pbrt order (export.py:261-277)
  - <= INLINE_TRI_LIMIT triangles inline as "trianglemesh", larger meshes
    as binary little-endian PLY under plys/ (export.py:303-383)
  - materials: Diffuse -> matte (sigma = degrees(roughness)), Glass ->
    glass Kr/Kt/eta, Glossy -> glossy Rs/roughness; image textures copied
    under textures/ with one Texture directive per file
    (export.py:394-523)

Divergences (each a deliberate hardening, not a capability gap):
  - meshes without UV layers export zero UVs with a warning instead of
    asserting (the reference requires exactly one uv layer)
  - non-relative texture paths warn and fall back to the rgb color
    instead of asserting
"""

from __future__ import annotations

import math
import os
import shutil
import struct
from dataclasses import dataclass, field

import numpy as np

INLINE_TRI_LIMIT = 100
_SWAP = (0, 2, 1)  # Blender Z-up -> pbrt Y-up axis order


@dataclass
class ExportResult:
    ok: bool = True
    errors: list = field(default_factory=list)
    warnings: list = field(default_factory=list)
    pbrt_path: str = ""
    ply_files: list = field(default_factory=list)
    texture_files: list = field(default_factory=list)


class _Ctx:
    """Per-export state: output dirs, dedup sets, diagnostics."""

    def __init__(self, out_path: str, blend_path: str):
        self.dir = os.path.dirname(os.path.abspath(out_path))
        self.blend_dir = os.path.dirname(blend_path) if blend_path else self.dir
        self.result = ExportResult(pbrt_path=out_path)
        self.exported_plys = set()
        self.seen_textures = set()

    def warn(self, msg: str):
        self.result.warnings.append(msg)

    def error(self, msg: str):
        self.result.errors.append(msg)
        self.result.ok = False


def _fmt(v) -> str:
    return f"{float(v):.9g}"


def _fmt3(v) -> str:
    return " ".join(_fmt(x) for x in v)


def _swap3(v):
    return (v[0], v[2], v[1])


def _mat(m) -> np.ndarray:
    """bpy matrix (iterable of rows) -> numpy [4,4]."""
    return np.asarray([[float(x) for x in row] for row in m], np.float64)


def _apply_p(m: np.ndarray, p) -> np.ndarray:
    v = m @ np.asarray([p[0], p[1], p[2], 1.0])
    return v[:3]


def _decompose(m: np.ndarray):
    """4x4 -> (translate [3], axis [3], angle rad, scale [3]).

    Mirrors mathutils' decompose enough for TRS export: scales from
    column norms (negative determinant folds into scale x)."""
    t = m[:3, 3].copy()
    basis = m[:3, :3].copy()
    scale = np.linalg.norm(basis, axis=0)
    if np.linalg.det(basis) < 0:
        scale[0] = -scale[0]
    rot = basis / np.where(scale == 0.0, 1.0, scale)[None, :]
    # Rotation matrix -> axis-angle.
    cos_a = np.clip((np.trace(rot) - 1.0) / 2.0, -1.0, 1.0)
    angle = math.acos(cos_a)
    if angle < 1e-8:
        axis = np.array([0.0, 0.0, 1.0])
    elif abs(angle - math.pi) < 1e-6:
        # Near-pi: axis from the largest diagonal of (R + I) / 2.
        q = (rot + np.eye(3)) / 2.0
        k = int(np.argmax(np.diag(q)))
        axis = q[:, k] / max(math.sqrt(max(q[k, k], 1e-12)), 1e-12)
        axis = axis / np.linalg.norm(axis)
    else:
        axis = np.array(
            [rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]]
        ) / (2.0 * math.sin(angle))
    return t, axis, angle, scale


def _camera_fov_deg(cam, res_x, res_y, aspect_x=1.0, aspect_y=1.0) -> float:
    """pbrt's fov is on the shorter axis; Blender's cam.angle is on the
    sensor-fit axis (export.py:110-127)."""
    film_w = res_x * aspect_x
    film_h = res_y * aspect_y
    fit = getattr(cam, "sensor_fit", "AUTO")
    if film_h < film_w:
        if fit == "VERTICAL":
            return math.degrees(cam.angle)
        return math.degrees(
            2.0 * math.atan(math.tan(cam.angle / 2.0) * film_h / film_w)
        )
    if fit == "HORIZONTAL":
        return math.degrees(cam.angle)
    return math.degrees(
        2.0 * math.atan(math.tan(cam.angle / 2.0) * film_w / film_h)
    )


def export_scene(depsgraph, scene, filepath, blend_path="") -> ExportResult:
    ctx = _Ctx(filepath, blend_path)
    os.makedirs(os.path.join(ctx.dir, "plys"), exist_ok=True)

    cam_obj = getattr(scene, "camera", None)
    if cam_obj is None:
        for obj in scene.objects:
            if obj.type == "CAMERA":
                cam_obj = obj
                break
    if cam_obj is None:
        ctx.error("No camera in scene")
        return ctx.result
    if cam_obj.data.type != "PERSP":
        ctx.error("Only perspective cameras are supported")
        return ctx.result

    lines = []
    _write_camera(ctx, lines, cam_obj, scene)
    _write_film(ctx, lines, scene, blend_path)
    lines.append("WorldBegin")
    lines.append("")
    _write_background(ctx, lines, scene)
    for obj in _roots(scene):
        _export_object(ctx, lines, depsgraph, obj)
    lines.append("WorldEnd")

    with open(filepath, "w") as f:
        f.write("\n".join(lines) + "\n")
    return ctx.result


def _roots(scene):
    """Objects in the scene's collection tree whose parent is None, in
    collection order (export.py:192-198)."""
    out = []

    def walk(coll):
        for obj in coll.objects:
            if getattr(obj, "parent", None) is None:
                out.append(obj)
        for child in getattr(coll, "children", []):
            walk(child)

    walk(scene.collection)
    return out


def _write_camera(ctx, lines, cam_obj, scene):
    m = _mat(cam_obj.matrix_world)
    eye = _apply_p(m, (0.0, 0.0, 0.0))
    target = _apply_p(m, (0.0, 0.0, -1.0))  # Blender cameras face -Z
    # Up transforms as a normal (inverse-transpose).
    up = (np.linalg.inv(m).T[:3, :3] @ np.asarray([0.0, 1.0, 0.0]))
    lines.append(f"LookAt {_fmt3(_swap3(eye))} # eye")
    lines.append(f"       {_fmt3(_swap3(target))} # target")
    lines.append(f"       {_fmt3(_swap3(up))} # up")
    fov = _camera_fov_deg(
        cam_obj.data,
        scene.render.resolution_x,
        scene.render.resolution_y,
        getattr(scene.render, "pixel_aspect_x", 1.0),
        getattr(scene.render, "pixel_aspect_y", 1.0),
    )
    lines.append(f'Camera "perspective" "float fov" {_fmt(fov)}')
    lines.append("")


def _write_film(ctx, lines, scene, blend_path):
    name = os.path.basename(blend_path).split(".")[0] if blend_path else "scene"
    lines.append('Sampler "halton" "integer pixelsamples" 128')
    lines.append('Integrator "path"')
    lines.append(f'Film "image" "string filename" "{name}.png"')
    lines.append(
        f'     "integer xresolution" [{scene.render.resolution_x}]'
        f' "integer yresolution" [{scene.render.resolution_y}]'
    )
    lines.append("")


def _write_background(ctx, lines, scene):
    world = getattr(scene, "world", None)
    tree = getattr(world, "node_tree", None) if world else None
    nodes = getattr(tree, "nodes", None) if tree else None
    bg = None
    if nodes is not None and "Background" in nodes:
        node = nodes["Background"]
        out_links = node.outputs["Background"].links
        if len(out_links) == 1 and (
            out_links[0].to_socket.node.name == "World Output"
        ):
            bg = node
    if bg is None:
        ctx.warn("No Background node feeds World Output; background is black")
        return
    color = bg.inputs["Color"].default_value
    strength = bg.inputs["Strength"].default_value
    rgb = [c * strength for c in color[:3]]
    lines.append(f'LightSource "infinite" "rgb L" [ {_fmt3(rgb)} ]')
    lines.append("")


def _export_object(ctx, lines, depsgraph, obj):
    if obj.type == "LIGHT":
        _export_light(ctx, lines, obj)
    elif obj.type == "MESH":
        _export_mesh(ctx, lines, depsgraph, obj)
    elif obj.type == "COLLECTION":
        ctx.warn(f"{obj.name_full}: instanced collections not supported")
    for child in getattr(obj, "children", []):
        _export_object(ctx, lines, depsgraph, child)


def _export_light(ctx, lines, obj):
    light = obj.data
    m = _mat(obj.matrix_world)
    # The 1/3pi folds Blender watts into pbrt radiant intensity the same
    # way the reference does (export.py:211,221).
    scale = light.energy / (3.0 * math.pi)
    rgb = [c * scale for c in light.color[:3]]
    if light.type == "POINT":
        pos = _swap3(_apply_p(m, (0, 0, 0)))
        lines.append(f"# {obj.name_full}")
        lines.append(
            f'LightSource "point" "point from" [ {_fmt3(pos)} ]'
            f' "rgb I" [ {_fmt3(rgb)} ]'
        )
        lines.append("")
    elif light.type == "SUN":
        frm = _swap3(_apply_p(m, (0, 0, 0)))
        to = _swap3(_apply_p(m, (0, 0, -1)))
        lines.append(f"# {obj.name_full}")
        lines.append(
            f'LightSource "distant" "point from" [ {_fmt3(frm)} ]'
            f' "point to" [ {_fmt3(to)} ] "rgb L" [ {_fmt3(rgb)} ]'
        )
        lines.append("")
    else:
        ctx.warn(f"{obj.name_full}: light type {light.type} not supported")


def _split_by_material(mesh, ctx):
    """Dedup loop vertices per material slot.

    Returns per-slot (verts, tris): verts = list of (position, normal,
    uv), tris = index triples in pbrt winding (Blender's is reversed,
    export.py:277)."""
    if not list(mesh.loop_triangles):
        mesh.calc_loop_triangles()
    if hasattr(mesh, "calc_normals_split"):
        mesh.calc_normals_split()

    uv_data = None
    if getattr(mesh.uv_layers, "active", None) is not None:
        uv_data = mesh.uv_layers.active.data
    else:
        ctx.warn(f"{mesh.name}: no active UV layer; writing zero UVs")

    n_slots = max(len(mesh.materials), 1)
    key_to_idx = [dict() for _ in range(n_slots)]
    verts = [[] for _ in range(n_slots)]
    tris = [[] for _ in range(n_slots)]

    for tri in mesh.loop_triangles:
        mi = tri.material_index if n_slots > 1 else 0
        idx = []
        for li in tri.loops:
            # Flat-shaded triangles key by (loop, face) so each face gets
            # its own copy carrying the face normal.
            key = li if tri.use_smooth else (li, id(tri))
            if key not in key_to_idx[mi]:
                loop = mesh.loops[li]
                p = tuple(mesh.vertices[loop.vertex_index].co[:3])
                n = tuple((loop.normal if tri.use_smooth else tri.normal)[:3])
                uv = tuple(uv_data[li].uv[:2]) if uv_data is not None else (0.0, 0.0)
                verts[mi].append((p, n, uv))
                key_to_idx[mi][key] = len(verts[mi]) - 1
            idx.append(key_to_idx[mi][key])
        tris[mi].append((idx[0], idx[2], idx[1]))
    return verts, tris


def _export_mesh(ctx, lines, depsgraph, obj):
    evaluated = obj.evaluated_get(depsgraph)
    mesh = evaluated.to_mesh(preserve_all_data_layers=True, depsgraph=depsgraph)
    verts, tris = _split_by_material(mesh, ctx)
    t, axis, angle, scale = _decompose(_mat(obj.matrix_world))
    materials = list(mesh.materials) or [None]

    for mi, material in enumerate(materials):
        if not tris[mi]:
            continue
        tag = f"{obj.name_full}:{material.name}" if material else obj.name_full
        lines.append(f"# {tag}")
        lines.append("AttributeBegin")
        if material is not None:
            _export_material(ctx, lines, material)
        if not np.allclose(t, 0.0, atol=1e-3):
            lines.append(f"  Translate {_fmt3(_swap3(t))}")
        if not math.isclose(angle, 0.0, abs_tol=0.1):
            lines.append(
                f"  Rotate {_fmt(-math.degrees(angle))} {_fmt3(_swap3(axis))}"
            )
        if not np.allclose(scale, 1.0, atol=1e-3):
            lines.append(f"  Scale {_fmt3(_swap3(scale))}")

        if len(tris[mi]) > INLINE_TRI_LIMIT:
            stem = f"{mesh.name}_{material.name}" if material else mesh.name
            rel = f"plys/{stem}.ply"
            if rel not in ctx.exported_plys:
                _write_binary_ply(
                    os.path.join(ctx.dir, rel), verts[mi], tris[mi]
                )
                ctx.exported_plys.add(rel)
                ctx.result.ply_files.append(rel)
            lines.append(f'  Shape "plymesh" "string filename" "{rel}"')
        else:
            _write_inline_mesh(lines, verts[mi], tris[mi])
        lines.append("AttributeEnd")
        lines.append("")


def _write_inline_mesh(lines, verts, tris):
    lines.append('  Shape "trianglemesh"')
    lines.append(
        '    "integer indices" [ '
        + " ".join(f"{a} {b} {c}" for a, b, c in tris) + " ]"
    )
    lines.append(
        '    "point P" [ '
        + " ".join(_fmt3(_swap3(p)) for p, _, _ in verts) + " ]"
    )
    lines.append(
        '    "normal N" [ '
        + " ".join(_fmt3(_swap3(n)) for _, n, _ in verts) + " ]"
    )
    lines.append(
        '    "float uv" [ '
        + " ".join(f"{_fmt(u)} {_fmt(v)}" for _, _, (u, v) in verts) + " ]"
    )


def _write_binary_ply(path, verts, tris):
    """Binary little-endian PLY with x y z nx ny nz u v vertices; axes
    swapped to pbrt orientation at write time (export.py:336-344)."""
    pos = np.asarray([p for p, _, _ in verts], np.float32)[:, _SWAP]
    nrm = np.asarray([n for _, n, _ in verts], np.float32)[:, _SWAP]
    uv = np.asarray([t for _, _, t in verts], np.float32)
    vdata = np.concatenate([pos, nrm, uv], axis=1).astype("<f4")
    idx = np.asarray(tris, np.uint32)
    face = np.zeros(
        len(tris),
        dtype=np.dtype([("n", "u1"), ("i", "<u4", 3)]),
    )
    face["n"] = 3
    face["i"] = idx
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property float u\nproperty float v\n"
        f"element face {len(tris)}\n"
        "property list uchar int vertex_index\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(vdata.tobytes())
        f.write(face.tobytes())


def _surface_node(material):
    tree = getattr(material, "node_tree", None)
    if tree is None:
        return None
    output = next(
        (n for n in tree.nodes if n.type == "OUTPUT_MATERIAL"), None
    )
    if output is None or not output.inputs["Surface"].links:
        return None
    return output.inputs["Surface"].links[0].from_node


def _export_material(ctx, lines, material):
    bsdf = _surface_node(material)
    if bsdf is None:
        ctx.warn(f"{material.name_full}: no surface BSDF; active material kept")
        return
    if bsdf.type == "BSDF_DIFFUSE":
        kd = _color_or_texture(ctx, lines, material, bsdf.inputs["Color"], "Kd")
        rough = bsdf.inputs["Roughness"]
        if rough.links:
            ctx.warn(f"{material.name_full}: linked diffuse roughness ignored")
            sigma = 0.0
        else:
            # Oren-Nayar sigma is in degrees; Blender roughness in [0,1]
            # radians-ish — same approximation the reference uses
            # (export.py:454-455).
            sigma = math.degrees(rough.default_value)
        if bsdf.inputs["Normal"].links:
            ctx.warn(f"{material.name_full}: normal maps not supported")
        lines.append(f'  Material "matte" {kd} "float sigma" {_fmt(sigma)}')
    elif bsdf.type == "BSDF_GLASS":
        color = bsdf.inputs["Color"]
        if color.links:
            ctx.warn(f"{material.name_full}: linked glass color ignored")
            rgb = (1.0, 1.0, 1.0)
        else:
            rgb = tuple(color.default_value[:3])
        rough = bsdf.inputs["Roughness"]
        if rough.links or rough.default_value > 0.001:
            ctx.warn(f"{material.name_full}: rough glass not supported")
        ior = bsdf.inputs["IOR"]
        eta = 1.5 if ior.links else ior.default_value
        if ior.links:
            ctx.warn(f"{material.name_full}: linked glass IOR ignored")
        lines.append('  Material "glass"')
        lines.append(f'    "rgb Kr" [ {_fmt3(rgb)} ]')
        lines.append(f'    "rgb Kt" [ {_fmt3(rgb)} ]')
        lines.append(f'    "float eta" {_fmt(eta)}')
    elif bsdf.type == "BSDF_GLOSSY":
        color = bsdf.inputs["Color"]
        if color.links:
            ctx.warn(f"{material.name_full}: linked glossy color ignored")
            rs = (0.5, 0.5, 0.5)
        else:
            rs = tuple(color.default_value[:3])
        rough = bsdf.inputs["Roughness"]
        if rough.links:
            ctx.warn(f"{material.name_full}: linked glossy roughness ignored")
            r = 0.5
        else:
            r = rough.default_value
        if bsdf.inputs["Normal"].links:
            ctx.warn(f"{material.name_full}: normal maps not supported")
        lines.append(
            f'  Material "glossy" "rgb Rs" [ {_fmt3(rs)} ]'
            f' "float roughness" {_fmt(r)}'
        )
    else:
        ctx.warn(
            f"{material.name_full}: BSDF {bsdf.type} not supported; "
            "active material kept"
        )


def _color_or_texture(ctx, lines, material, color_input, slot: str) -> str:
    """Kd as either an rgb literal or an imagemap Texture reference; the
    image file is copied under textures/ once (export.py:416-445)."""
    if not color_input.links:
        return f'"rgb {slot}" [ {_fmt3(color_input.default_value[:3])} ]'
    tex_node = color_input.links[0].from_node
    filepath = getattr(getattr(tex_node, "image", None), "filepath", None)
    if not filepath or not filepath.startswith("//") or filepath.startswith("//.."):
        ctx.warn(
            f"{material.name_full}: texture path {filepath!r} is not "
            "blend-relative; using rgb fallback"
        )
        return f'"rgb {slot}" [ {_fmt3(color_input.default_value[:3])} ]'
    rel = filepath[2:]
    if filepath not in ctx.seen_textures:
        src = os.path.join(ctx.blend_dir, rel)
        dst = os.path.join(ctx.dir, "textures", rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy(src, dst)
        # Emitted in place (inside the current attribute block), like the
        # reference (export.py:438-440) — pbrt scopes textures in the
        # graphics state, so this is valid and keeps one directive/file.
        lines.append(
            f'  Texture "{filepath}" "spectrum" "imagemap" '
            f'"string filename" "textures/{rel}"'
        )
        ctx.seen_textures.add(filepath)
        ctx.result.texture_files.append(rel)
    return f'"texture {slot}" "{filepath}"'
