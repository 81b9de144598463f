"""Material-simplification utilities for Blender.

Parity target: /root/reference/blender_utils/__init__.py:14-73 — an
operator that rewires every material to a plain Diffuse BSDF, keeping the
Principled node's base color (or its image texture link) and deleting all
other nodes.  The rewiring itself lives in convert_materials() so it
unit-tests against tests/fake_bpy.py without Blender.
"""

bl_info = {
    "name": "yuki-tpu utils",
    "blender": (2, 92, 0),
    "category": "Development",
}

try:
    import bpy

    _HAVE_BPY = True
except ImportError:
    _HAVE_BPY = False


def convert_materials(materials, log=None):
    """Rewire each material to Diffuse-only. Returns #converted.

    For every material with a node tree: find the output node and a
    Principled BSDF's Base Color; create a Diffuse BSDF wired to the
    output; carry the base color value, or relink an image-texture input;
    remove every other node."""
    converted = 0
    for material in materials:
        tree = getattr(material, "node_tree", None)
        if not tree:
            continue
        nodes = tree.nodes
        output = None
        base_color = None
        for node in nodes:
            if node.type == "OUTPUT_MATERIAL":
                output = node
            elif node.type == "BSDF_PRINCIPLED":
                base_color = node.inputs["Base Color"]
        if output is None:
            if log:
                log(f"no output node in {material.name}")
            continue
        if base_color is None:
            if log:
                log(f"no principled base color in {material.name}")
            continue

        diffuse = nodes.new("ShaderNodeBsdfDiffuse")
        tree.links.new(output.inputs["Surface"], diffuse.outputs["BSDF"])
        keep = {output, diffuse}
        if base_color.links and base_color.links[0].from_node.type == "TEX_IMAGE":
            tex = base_color.links[0].from_node
            tree.links.new(diffuse.inputs["Color"], tex.outputs["Color"])
            keep.add(tex)
        else:
            diffuse.inputs["Color"].default_value = base_color.default_value
        for node in list(nodes):
            if node not in keep:
                nodes.remove(node)
        converted += 1
    return converted


if _HAVE_BPY:

    class YUKI_OT_convert_to_diffuse(bpy.types.Operator):
        """Convert all materials to Diffuse BSDF."""

        bl_idname = "yuki_tpu.convert_all_to_diffuse"
        bl_label = "Convert all materials to Diffuse BSDF"
        bl_options = {"REGISTER", "UNDO"}

        def execute(self, context):
            del context
            n = convert_materials(bpy.data.materials, log=print)
            self.report({"INFO"}, f"Converted {n} material(s)")
            return {"FINISHED"}

    def _menu(self, context):
        self.layout.operator(YUKI_OT_convert_to_diffuse.bl_idname)

    def register():
        bpy.utils.register_class(YUKI_OT_convert_to_diffuse)
        bpy.types.TOPBAR_MT_file_cleanup.append(_menu)

    def unregister():
        bpy.types.TOPBAR_MT_file_cleanup.remove(_menu)
        bpy.utils.unregister_class(YUKI_OT_convert_to_diffuse)
