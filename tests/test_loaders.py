"""Scene loader tests with generated fixtures (PLY ascii/binary, pbrt-v3,
Mitsuba 2.0) — coverage the reference never had (SURVEY.md §4)."""

import os
import struct
import textwrap

import numpy as np
import pytest

from yuki_tpu.app.settings import SceneLoadSettings
from yuki_tpu.scene.ply import parse_ply, load_ply_scene
from yuki_tpu.scene.pbrt import load_pbrt, sampled_spectrum_to_rgb
from yuki_tpu.scene.mitsuba import load_mitsuba
from yuki_tpu.scene.data import MAT_GLASS, MAT_MATTE, MAT_METAL


def write_ascii_ply(path, with_normals=False, quads=False):
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    lines = ["ply", "format ascii 1.0", f"element vertex {len(pts)}"]
    lines += ["property float x", "property float y", "property float z"]
    if with_normals:
        lines += ["property float nx", "property float ny", "property float nz"]
    n_faces = 1 if quads else 2
    lines += [
        f"element face {n_faces}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for p in pts:
        row = f"{p[0]} {p[1]} {p[2]}"
        if with_normals:
            row += " 0 0 1"
        lines.append(row)
    if quads:
        lines.append("4 0 1 2 3")
    else:
        lines.append("3 0 1 2")
        lines.append("3 0 2 3")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_binary_ply(path, big_endian=False):
    bo = ">" if big_endian else "<"
    fmt_name = "binary_big_endian" if big_endian else "binary_little_endian"
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    header = (
        f"ply\nformat {fmt_name} 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for p in pts:
            f.write(struct.pack(bo + "fff", *p))
        for face in ([0, 1, 2], [0, 2, 3]):
            f.write(struct.pack(bo + "B", 3))
            f.write(struct.pack(bo + "iii", *face))


class TestPly:
    def test_ascii(self, tmp_path):
        p = str(tmp_path / "t.ply")
        write_ascii_ply(p)
        m = parse_ply(p)
        assert m.points.shape == (4, 3)
        assert m.indices.tolist() == [0, 1, 2, 0, 2, 3]
        assert m.normals is None

    def test_ascii_normals(self, tmp_path):
        p = str(tmp_path / "t.ply")
        write_ascii_ply(p, with_normals=True)
        m = parse_ply(p)
        assert m.normals.shape == (4, 3)
        assert np.allclose(m.normals[:, 2], 1.0)

    def test_quad_fan_triangulation(self, tmp_path):
        p = str(tmp_path / "q.ply")
        write_ascii_ply(p, quads=True)
        m = parse_ply(p)
        assert m.indices.tolist() == [0, 1, 2, 0, 2, 3]

    def test_binary_le(self, tmp_path):
        p = str(tmp_path / "b.ply")
        write_binary_ply(p)
        m = parse_ply(p)
        assert m.points.shape == (4, 3)
        assert m.indices.tolist() == [0, 1, 2, 0, 2, 3]

    def test_binary_be(self, tmp_path):
        p = str(tmp_path / "b.ply")
        write_binary_ply(p, big_endian=True)
        m = parse_ply(p)
        assert np.allclose(m.points[2], [1, 1, 0])

    def test_missing_xyz_rejected(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_text(
            "ply\nformat ascii 1.0\nelement vertex 1\nproperty float x\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0\n3 0 0 0\n"
        )
        with pytest.raises(ValueError):
            parse_ply(str(p))

    def test_standalone_scene_normalized(self, tmp_path):
        p = str(tmp_path / "t.ply")
        write_ascii_ply(p)
        scene, cam, fs = load_ply_scene(SceneLoadSettings(path=p))
        # Scaled into ~unit box centered at origin (scene/mod.rs:99-150).
        pts = np.asarray(scene.data.tris.p0)
        assert np.abs(pts[: scene.meta.n_tris]).max() <= 0.51
        assert scene.meta.n_lights == 1
        assert cam.position == (2.0, 2.0, 2.0)


PBRT_SCENE = """
# test scene
Film "image" "integer xresolution" [ 320 ] "integer yresolution" [ 240 ]
Camera "perspective" "float fov" [ 60 ]
LookAt 0 1 5  0 1 0  0 1 0
WorldBegin
LightSource "point" "rgb I" [ 10 10 10 ] "point from" [ 0 4 0 ]
LightSource "infinite" "rgb L" [ 0.1 0.2 0.3 ]
Material "matte" "rgb Kd" [ 0.8 0.2 0.2 ]
Shape "trianglemesh"
  "integer indices" [ 0 1 2 ]
  "point P" [ -1 0 0  1 0 0  0 2 0 ]
AttributeBegin
  Translate 0 1 0
  Material "glass" "float eta" [ 1.6 ]
  Shape "sphere" "float radius" [ 0.5 ]
AttributeEnd
MakeNamedMaterial "shiny" "string type" "metal" "float roughness" [ 0.1 ]
NamedMaterial "shiny"
Shape "trianglemesh"
  "integer indices" [ 0 1 2 ]
  "point P" [ -1 0 1  1 0 1  0 2 1 ]
WorldEnd
"""


class TestPbrt:
    def test_full_scene(self, tmp_path):
        p = tmp_path / "s.pbrt"
        p.write_text(PBRT_SCENE)
        scene, cam, fs = load_pbrt(SceneLoadSettings(path=str(p)))
        assert fs.res == (320, 240)
        assert cam.fov.axis == "y"  # res_y < res_x
        assert cam.fov.degrees == 60
        assert cam.position == (0.0, 1.0, 5.0)
        assert scene.meta.n_tris == 2
        assert scene.meta.n_spheres == 1
        assert scene.meta.n_lights == 1  # infinite becomes background
        bg = np.asarray(scene.data.background)
        assert np.allclose(bg, [0.1, 0.2, 0.3])
        mats = scene.data.materials
        types = set(np.asarray(mats.mtype).tolist())
        assert {MAT_MATTE, MAT_GLASS, MAT_METAL} <= types
        # Sphere center translated to (0,1,0).
        o2w = np.asarray(scene.data.spheres.obj_to_world[0])
        assert np.allclose(o2w[:3, 3], [0, 1, 0])

    def test_include(self, tmp_path):
        (tmp_path / "inc.pbrt").write_text(
            'Shape "trianglemesh" "integer indices" [0 1 2] '
            '"point P" [0 0 0 1 0 0 0 1 0]\n'
        )
        (tmp_path / "main.pbrt").write_text(
            'WorldBegin\nInclude "inc.pbrt"\nWorldEnd\n'
        )
        scene, _, _ = load_pbrt(SceneLoadSettings(path=str(tmp_path / "main.pbrt")))
        assert scene.meta.n_tris == 1

    def test_spectrum_white_is_whitish(self):
        lam = np.linspace(380, 730, 60)
        rgb = sampled_spectrum_to_rgb(lam, np.ones_like(lam))
        assert (rgb > 0).all()
        assert abs(rgb[0] - rgb[2]) / rgb.max() < 0.5

    def test_ply_shape(self, tmp_path):
        write_ascii_ply(str(tmp_path / "m.ply"))
        (tmp_path / "s.pbrt").write_text(
            'WorldBegin\nShape "plymesh" "string filename" "m.ply"\nWorldEnd\n'
        )
        scene, _, _ = load_pbrt(SceneLoadSettings(path=str(tmp_path / "s.pbrt")))
        assert scene.meta.n_tris == 2


MITSUBA_SCENE = """<?xml version="1.0"?>
<scene version="2.1.0">
  <default name="resx" value="512"/>
  <default name="resy" value="384"/>
  <integrator type="path"/>
  <sensor type="perspective">
    <string name="fov_axis" value="x"/>
    <float name="fov" value="50"/>
    <transform name="to_world">
      <translate value="0 1 -4"/>
    </transform>
  </sensor>
  <bsdf type="twosided" id="wall">
    <bsdf type="diffuse">
      <rgb name="reflectance" value="0.7 0.6 0.5"/>
    </bsdf>
  </bsdf>
  <bsdf type="dielectric" id="glass">
    <float name="int_ior" value="1.5"/>
  </bsdf>
  <emitter type="point">
    <point name="position" x="1" y="3" z="0"/>
    <rgb name="intensity" value="20 20 20"/>
  </emitter>
  <shape type="ply">
    <string name="filename" value="mesh.ply"/>
    <ref name="bsdf" id="wall"/>
    <transform name="to_world">
      <scale value="2"/>
      <translate value="0 0 1"/>
    </transform>
  </shape>
</scene>
"""


class TestMitsuba:
    def test_full_scene(self, tmp_path):
        write_ascii_ply(str(tmp_path / "mesh.ply"))
        p = tmp_path / "scene.xml"
        p.write_text(MITSUBA_SCENE)
        scene, cam, fs = load_mitsuba(SceneLoadSettings(path=str(p)))
        assert fs.res == (512, 384)
        assert cam.fov.axis == "x" and cam.fov.degrees == 50
        # Sensor position x is flipped by the handedness fix.
        assert np.allclose(cam.position, (0, 1, -4), atol=1e-5)
        assert scene.meta.n_tris == 2
        assert scene.meta.n_lights == 1
        # Point light x flipped.
        assert np.allclose(np.asarray(scene.data.lights.p[0]), [-1, 3, 0])
        # Mesh transform: scale 2 then translate, with x flip.
        pts = np.asarray(scene.data.tris.p0[:2])
        assert np.allclose(pts[0], [0, 0, 1])

    def test_wrong_version_rejected(self, tmp_path):
        p = tmp_path / "bad.xml"
        p.write_text('<scene version="0.6.0"></scene>')
        with pytest.raises(Exception):
            load_mitsuba(SceneLoadSettings(path=str(p)))


class TestAtriumAssets:
    """The Sponza-class asset pipeline: tools/make_atrium_assets.py writes
    binary PLYs + a pbrt scene; loading it exercises the same pbrt->plymesh
    path a real asset would (VERDICT round-1: the large-scene bench must
    flow through the loaders, not only procedural builders)."""

    def test_generate_and_load(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from make_atrium_assets import write_scene

        counts = write_scene(str(tmp_path), small=True)
        scene, cam, fs = load_pbrt(
            SceneLoadSettings(path=str(tmp_path / "atrium.pbrt"))
        )
        # Triangle counts must round-trip exactly through PLY + pbrt.
        assert scene.meta.n_tris == counts["total"]
        assert scene.meta.n_spheres == 2  # brass bowls (columns_x=3 -> 2)
        assert scene.meta.n_lights == 2  # distant + point (infinite -> bg)
        assert fs.res == (1920, 1080)
        assert np.allclose(np.asarray(scene.data.background), 2.5, atol=0.6)
        # Deterministic output: regenerating produces identical bytes.
        import hashlib

        h1 = hashlib.sha256(
            (tmp_path / "plys" / "stone.ply").read_bytes()
        ).hexdigest()
        write_scene(str(tmp_path), small=True)
        h2 = hashlib.sha256(
            (tmp_path / "plys" / "stone.ply").read_bytes()
        ).hexdigest()
        assert h1 == h2


class TestPbrtSigmaTexture:
    def test_texture_sigma_binds(self, tmp_path):
        import numpy as np
        from PIL import Image

        img = (np.ones((2, 2, 3)) * 127).astype("uint8")
        Image.fromarray(img).save(tmp_path / "sig.png")
        (tmp_path / "s.pbrt").write_text(
            'Texture "sig" "spectrum" "imagemap" "string filename" "sig.png"\n'
            'WorldBegin\n'
            'Material "matte" "rgb Kd" [0.5 0.5 0.5] "texture sigma" "sig"\n'
            'Shape "trianglemesh" "integer indices" [0 1 2]\n'
            '  "point P" [0 0 0  1 0 0  0 1 0]\n'
            'WorldEnd\n'
        )
        scene, _, _ = load_pbrt(SceneLoadSettings(path=str(tmp_path / "s.pbrt")))
        assert scene.meta.has_sigma_tex
        assert scene.meta.has_sigma
        # The matte row (after the default material at index 0) binds tex1.
        assert int(np.asarray(scene.data.materials.tex1)[1]) >= 0
