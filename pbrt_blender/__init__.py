"""pbrt-v3 exporter add-on for Blender.

Parity target: /root/reference/pbrt_blender (export.py:34-58 operator,
65-174 scene export, 201-391 objects, 394-523 materials).  The export
logic lives in exporter.py as plain functions over bpy-shaped objects so
it unit-tests against tests/fake_bpy.py without a Blender install; this
module only carries the Blender registration glue.

Install: copy the pbrt_blender directory into Blender's addons folder and
enable "pbrt-v3 exporter (yuki-tpu)"; File > Export > pbrt-v3 (.pbrt).
"""

bl_info = {
    "name": "pbrt-v3 exporter (yuki-tpu)",
    "blender": (2, 92, 0),
    "category": "Import-Export",
}

try:
    import bpy
    from bpy_extras.io_utils import ExportHelper

    _HAVE_BPY = True
except ImportError:  # unit tests / headless tooling without Blender
    _HAVE_BPY = False

from . import exporter


if _HAVE_BPY:

    class PBRT_OT_export_yuki(bpy.types.Operator, ExportHelper):
        """Export the scene as a pbrt-v3 file (+ plys/ and textures/)."""

        bl_idname = "pbrt_yuki.export"
        bl_label = "pbrt-v3 (.pbrt)"
        bl_options = {"REGISTER", "UNDO"}
        filename_ext = ".pbrt"

        def execute(self, context):
            depsgraph = context.evaluated_depsgraph_get()
            result = exporter.export_scene(
                depsgraph, context.scene, self.filepath,
                blend_path=bpy.data.filepath,
            )
            if not result.ok:
                self.report({"ERROR"}, "; ".join(result.errors))
                return {"CANCELLED"}
            if result.warnings:
                self.report(
                    {"WARNING"},
                    f"Exported with {len(result.warnings)} warning(s); "
                    "see console.",
                )
            else:
                self.report({"INFO"}, "Scene exported")
            return {"FINISHED"}

    def _menu(self, context):
        self.layout.operator(PBRT_OT_export_yuki.bl_idname)

    def register():
        bpy.utils.register_class(PBRT_OT_export_yuki)
        bpy.types.TOPBAR_MT_file_export.append(_menu)

    def unregister():
        bpy.types.TOPBAR_MT_file_export.remove(_menu)
        bpy.utils.unregister_class(PBRT_OT_export_yuki)
