"""Blender add-on tests against the bpy fake (no Blender install).

Round-trip bar from VERDICT round-1 item 7: exported .pbrt + .ply from the
fake scene must load through yuki_tpu.scene.pbrt with the same triangle /
material counts."""

import math
import os

import numpy as np
import pytest

from pbrt_blender import exporter
from blender_utils import convert_materials
import fake_bpy as fb


@pytest.fixture
def scene():
    cam = fb.Object("CAMERA", "Camera", fb.CameraData(),
                    fb.translate4(0.0, -3.0, 1.0))
    light = fb.Object("LIGHT", "Lamp", fb.LightData("POINT", 100.0),
                      fb.translate4(1.0, 2.0, 3.0))
    sun = fb.Object("LIGHT", "Sun", fb.LightData("SUN", 5.0))
    big = fb.Object(
        "MESH", "Floor",
        fb.grid_mesh("FloorMesh", 12, 12, fb.diffuse_material("Red")),
        fb.translate4(0.0, 0.0, -1.0),
    )  # 242 tris -> PLY path
    small = fb.Object(
        "MESH", "Panel",
        fb.grid_mesh("PanelMesh", 2, 3, fb.glossy_material("Gold")),
    )  # 4 tris -> inline path
    return fb.Scene([cam, light, sun, big, small], camera=cam)


class TestExporter:
    def test_export_structure(self, scene, tmp_path):
        out = tmp_path / "scene.pbrt"
        res = exporter.export_scene(fb.Depsgraph(), scene, str(out))
        assert res.ok, res.errors
        text = out.read_text()
        assert "LookAt" in text
        assert 'Camera "perspective"' in text
        assert 'LightSource "infinite"' in text
        assert 'LightSource "point"' in text
        assert 'LightSource "distant"' in text
        assert 'Material "matte"' in text
        assert 'Material "glossy"' in text
        assert 'Shape "plymesh"' in text
        assert 'Shape "trianglemesh"' in text
        assert res.ply_files == ["plys/FloorMesh_Red.ply"]
        assert (tmp_path / "plys" / "FloorMesh_Red.ply").exists()

    def test_roundtrip_counts(self, scene, tmp_path):
        """Exported scene loads through the pbrt loader with matching
        triangle and light counts."""
        out = tmp_path / "scene.pbrt"
        res = exporter.export_scene(fb.Depsgraph(), scene, str(out))
        assert res.ok

        from yuki_tpu.app.settings import SceneLoadSettings
        from yuki_tpu.scene.pbrt import load_pbrt

        sc, cam_params, fs = load_pbrt(SceneLoadSettings(path=str(out)))
        # 11x11x2 grid tris + 1x2x2 panel tris
        assert sc.meta.n_tris == 242 + 4
        # point + distant (infinite becomes the background, not a light)
        assert sc.meta.n_lights == 2
        assert np.asarray(sc.data.background).max() > 0

    def test_fov_sensor_fit(self):
        cam = fb.CameraData(angle=math.radians(65.0), sensor_fit="AUTO")
        # Landscape + AUTO: Blender angle is horizontal, pbrt fov is the
        # short (y) axis.
        fov = exporter._camera_fov_deg(cam, 640, 480)
        expected = math.degrees(
            2 * math.atan(math.tan(math.radians(65.0) / 2) * 480 / 640)
        )
        assert abs(fov - expected) < 1e-6
        # Portrait + AUTO: Blender fits the angle to the larger (y) axis,
        # pbrt fov is the short (x) axis -> scale by w/h.
        expected_p = math.degrees(
            2 * math.atan(math.tan(math.radians(65.0) / 2) * 480 / 640)
        )
        assert abs(exporter._camera_fov_deg(cam, 480, 640) - expected_p) < 1e-6
        cam_v = fb.CameraData(angle=math.radians(50.0), sensor_fit="VERTICAL")
        assert abs(exporter._camera_fov_deg(cam_v, 640, 480) - 50.0) < 1e-6

    def test_winding_flip_and_axis_swap(self, tmp_path):
        """Blender (CCW, Z-up) -> pbrt (flipped winding, Y-up)."""
        mat = fb.diffuse_material("M")
        mesh = fb.grid_mesh("G", 2, 2, mat)
        obj = fb.Object("MESH", "G", mesh)
        cam = fb.Object("CAMERA", "Camera", fb.CameraData())
        scene = fb.Scene([cam, obj], camera=cam)
        out = tmp_path / "w.pbrt"
        assert exporter.export_scene(fb.Depsgraph(), scene, str(out)).ok
        text = out.read_text()
        # First tri's loops are v0=(0,0,0), v2=(0.1,0,0), v3=(0.1,0.1,0);
        # pbrt axis order is (x, z, y).
        assert '"point P" [ 0 0 0 0.1 0 0 0.1 0 0.1' in text
        # Winding flips (0,1,2) -> (0,2,1).
        assert '"integer indices" [ 0 2 1' in text

    def test_transform_lines(self, tmp_path):
        m = fb.translate4(1.0, 2.0, 3.0)
        obj = fb.Object("MESH", "T",
                        fb.grid_mesh("TM", 2, 2, fb.diffuse_material("M")), m)
        cam = fb.Object("CAMERA", "Camera", fb.CameraData())
        out = tmp_path / "t.pbrt"
        assert exporter.export_scene(
            fb.Depsgraph(), fb.Scene([cam, obj], camera=cam), str(out)
        ).ok
        # Translate is axis-swapped; no Rotate/Scale for identity parts.
        text = out.read_text()
        assert "Translate 1 3 2" in text
        assert "Rotate" not in text
        assert "  Scale" not in text

    def test_missing_camera_fails(self, tmp_path):
        scene = fb.Scene([fb.Object("LIGHT", "L", fb.LightData())])
        res = exporter.export_scene(
            fb.Depsgraph(), scene, str(tmp_path / "x.pbrt")
        )
        assert not res.ok

    def test_texture_copy(self, tmp_path):
        tex_src = tmp_path / "blend" / "wall.png"
        os.makedirs(tex_src.parent)
        tex_src.write_bytes(b"\x89PNG fake")
        mat = fb.diffuse_material("Tex")
        tex = fb.Node("TEX_IMAGE", name="Image Texture",
                      outputs=[fb.Socket("Color")])
        tex.image = type("Img", (), {"filepath": "//wall.png"})()
        mat.node_tree.nodes._nodes.append(tex)
        bsdf = mat.node_tree.nodes["Diffuse BSDF"]
        mat.node_tree.links.new(bsdf.inputs["Color"], tex.outputs["Color"])
        obj = fb.Object("MESH", "Wall", fb.grid_mesh("WallMesh", 2, 2, mat))
        cam = fb.Object("CAMERA", "Camera", fb.CameraData())
        out = tmp_path / "out" / "tex.pbrt"
        os.makedirs(out.parent)
        res = exporter.export_scene(
            fb.Depsgraph(), fb.Scene([cam, obj], camera=cam), str(out),
            blend_path=str(tmp_path / "blend" / "scene.blend"),
        )
        assert res.ok
        assert (out.parent / "textures" / "wall.png").exists()
        text = out.read_text()
        assert 'Texture "//wall.png" "spectrum" "imagemap"' in text
        assert '"texture Kd" "//wall.png"' in text


class TestConvertToDiffuse:
    def test_principled_color_carried(self):
        mat = fb.principled_material("P", base_color=(0.1, 0.5, 0.9, 1.0))
        assert convert_materials([mat]) == 1
        nodes = list(mat.node_tree.nodes)
        types = sorted(n.type for n in nodes)
        assert types == ["BSDF_DIFFUSE", "OUTPUT_MATERIAL"]
        out = next(n for n in nodes if n.type == "OUTPUT_MATERIAL")
        diffuse = out.inputs["Surface"].links[0].from_node
        assert diffuse.type == "BSDF_DIFFUSE"
        assert tuple(diffuse.inputs["Color"].default_value[:3]) == (0.1, 0.5, 0.9)

    def test_texture_link_preserved(self):
        mat = fb.principled_material("PT", texture_path="//t.png")
        assert convert_materials([mat]) == 1
        nodes = list(mat.node_tree.nodes)
        types = sorted(n.type for n in nodes)
        assert types == ["BSDF_DIFFUSE", "OUTPUT_MATERIAL", "TEX_IMAGE"]
        diffuse = next(n for n in nodes if n.type == "BSDF_DIFFUSE")
        assert diffuse.inputs["Color"].links[0].from_node.type == "TEX_IMAGE"

    def test_materials_without_trees_skipped(self):
        bare = fb.Material("bare", None)
        no_out = fb.Material("noout", fb.NodeTree([fb.Node(
            "BSDF_PRINCIPLED", inputs=[fb.Socket("Base Color", [1, 1, 1, 1])]
        )]))
        assert convert_materials([bare, no_out]) == 0
