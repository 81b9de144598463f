"""Minimal bpy-shaped fixtures for testing the Blender add-ons without a
Blender install (VERDICT round-1 item 7).  Only the attributes the
add-ons actually touch exist; everything is plain Python + lists."""

from __future__ import annotations

import math


class Socket:
    def __init__(self, name, default_value=None, node=None):
        self.name = name
        self.default_value = default_value
        self.links = []
        self.node = node


class Link:
    def __init__(self, from_node, from_socket, to_socket):
        self.from_node = from_node
        self.from_socket = from_socket
        self.to_socket = to_socket


class Node:
    def __init__(self, ntype, name=None, inputs=(), outputs=()):
        self.type = ntype
        self.name = name or ntype
        self.inputs = {s.name: s for s in inputs}
        self.outputs = {s.name: s for s in outputs}
        for s in list(self.inputs.values()) + list(self.outputs.values()):
            s.node = self


class Nodes:
    def __init__(self, nodes=()):
        self._nodes = list(nodes)

    def __iter__(self):
        return iter(self._nodes)

    def __contains__(self, name):
        return any(n.name == name for n in self._nodes)

    def __getitem__(self, name):
        for n in self._nodes:
            if n.name == name:
                return n
        raise KeyError(name)

    def new(self, bl_idname):
        mapping = {
            "ShaderNodeBsdfDiffuse": Node(
                "BSDF_DIFFUSE",
                name="Diffuse BSDF",
                inputs=[
                    Socket("Color", [0.8, 0.8, 0.8, 1.0]),
                    Socket("Roughness", 0.0),
                    Socket("Normal", None),
                ],
                outputs=[Socket("BSDF")],
            ),
        }
        node = mapping[bl_idname]
        self._nodes.append(node)
        return node

    def remove(self, node):
        self._nodes.remove(node)


class Links:
    def new(self, to_socket, from_socket):
        link = Link(from_socket.node, from_socket, to_socket)
        to_socket.links = [link]
        from_socket.links.append(link)
        return link


class NodeTree:
    def __init__(self, nodes=()):
        self.nodes = Nodes(nodes)
        self.links = Links()


def output_node():
    return Node("OUTPUT_MATERIAL", name="Material Output",
                inputs=[Socket("Surface")])


def diffuse_material(name, color=(0.8, 0.2, 0.2, 1.0), roughness=0.0):
    out = output_node()
    bsdf = Node(
        "BSDF_DIFFUSE",
        name="Diffuse BSDF",
        inputs=[Socket("Color", list(color)), Socket("Roughness", roughness),
                Socket("Normal", None)],
        outputs=[Socket("BSDF")],
    )
    tree = NodeTree([out, bsdf])
    tree.links.new(out.inputs["Surface"], bsdf.outputs["BSDF"])
    return Material(name, tree)


def glossy_material(name, color=(0.9, 0.7, 0.3, 1.0), roughness=0.2):
    out = output_node()
    bsdf = Node(
        "BSDF_GLOSSY",
        name="Glossy BSDF",
        inputs=[Socket("Color", list(color)), Socket("Roughness", roughness),
                Socket("Normal", None)],
        outputs=[Socket("BSDF")],
    )
    tree = NodeTree([out, bsdf])
    tree.links.new(out.inputs["Surface"], bsdf.outputs["BSDF"])
    return Material(name, tree)


def glass_material(name, color=(1.0, 1.0, 1.0, 1.0), ior=1.45):
    out = output_node()
    bsdf = Node(
        "BSDF_GLASS",
        name="Glass BSDF",
        inputs=[Socket("Color", list(color)), Socket("Roughness", 0.0),
                Socket("IOR", ior), Socket("Normal", None)],
        outputs=[Socket("BSDF")],
    )
    tree = NodeTree([out, bsdf])
    tree.links.new(out.inputs["Surface"], bsdf.outputs["BSDF"])
    return Material(name, tree)


def principled_material(name, base_color=(0.1, 0.5, 0.9, 1.0),
                        texture_path=None):
    out = output_node()
    principled = Node(
        "BSDF_PRINCIPLED",
        name="Principled BSDF",
        inputs=[Socket("Base Color", list(base_color)),
                Socket("Roughness", 0.5)],
        outputs=[Socket("BSDF")],
    )
    extra = Node("BSDF_TRANSPARENT", name="Stray Node",
                 outputs=[Socket("BSDF")])
    nodes = [out, principled, extra]
    tree = NodeTree(nodes)
    tree.links.new(out.inputs["Surface"], principled.outputs["BSDF"])
    if texture_path is not None:
        tex = Node("TEX_IMAGE", name="Image Texture",
                   outputs=[Socket("Color")])
        tex.image = type("Img", (), {"filepath": texture_path})()
        tree.nodes._nodes.append(tex)
        tree.links.new(principled.inputs["Base Color"], tex.outputs["Color"])
    return Material(name, tree)


class Material:
    def __init__(self, name, node_tree):
        self.name = name
        self.name_full = name
        self.node_tree = node_tree


class Vertex:
    def __init__(self, co):
        self.co = tuple(co)


class Loop:
    def __init__(self, vertex_index, normal=(0.0, 0.0, 1.0)):
        self.vertex_index = vertex_index
        self.normal = tuple(normal)


class LoopTriangle:
    def __init__(self, loops, material_index=0, use_smooth=True,
                 normal=(0.0, 0.0, 1.0)):
        self.loops = tuple(loops)
        self.material_index = material_index
        self.use_smooth = use_smooth
        self.normal = tuple(normal)


class UVDatum:
    def __init__(self, uv):
        self.uv = tuple(uv)


class UVLayer:
    def __init__(self, data):
        self.data = data


class UVLayers:
    def __init__(self, active=None):
        self.active = active


class Mesh:
    def __init__(self, name, vertices, loops, loop_triangles, materials=(),
                 uvs=None):
        self.name = name
        self.vertices = [Vertex(v) for v in vertices]
        self.loops = [Loop(*l) if isinstance(l, tuple) else l for l in loops]
        self.loop_triangles = list(loop_triangles)
        self.materials = list(materials)
        data = [UVDatum(uv) for uv in uvs] if uvs is not None else None
        self.uv_layers = UVLayers(UVLayer(data) if data else None)

    def calc_loop_triangles(self):
        pass

    def calc_normals_split(self):
        pass


def grid_mesh(name, nx, nz, material, y=0.0, smooth=True):
    """(nx-1)*(nz-1)*2 triangles in the XY plane at z=y."""
    verts = [(i * 0.1, j * 0.1, y) for i in range(nx) for j in range(nz)]
    loops = []
    tris = []
    uvs = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            a = i * nz + j
            b = (i + 1) * nz + j
            for tri in ((a, b, b + 1), (a, b + 1, a + 1)):
                base = len(loops)
                for vi in tri:
                    loops.append(Loop(vi, (0.0, 0.0, 1.0)))
                    uvs.append((verts[vi][0], verts[vi][1]))
                tris.append(
                    LoopTriangle((base, base + 1, base + 2), 0, smooth)
                )
    return Mesh(name, verts, loops, tris, [material], uvs)


def identity4():
    return [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]


def translate4(x, y, z):
    m = identity4()
    m[0][3], m[1][3], m[2][3] = x, y, z
    return m


class Object:
    def __init__(self, otype, name, data=None, matrix_world=None,
                 children=(), parent=None):
        self.type = otype
        self.name = name
        self.name_full = name
        self.data = data
        self.matrix_world = matrix_world or identity4()
        self.children = list(children)
        self.parent = parent
        for c in self.children:
            c.parent = self

    def evaluated_get(self, depsgraph):
        return self

    def to_mesh(self, **kwargs):
        return self.data


class CameraData:
    def __init__(self, angle=math.radians(65.0), sensor_fit="AUTO"):
        self.type = "PERSP"
        self.angle = angle
        self.sensor_fit = sensor_fit


class LightData:
    def __init__(self, ltype="POINT", energy=100.0, color=(1.0, 1.0, 1.0)):
        self.type = ltype
        self.energy = energy
        self.color = tuple(color)


class Render:
    def __init__(self, res=(640, 480)):
        self.resolution_x, self.resolution_y = res
        self.pixel_aspect_x = 1.0
        self.pixel_aspect_y = 1.0


class Collection:
    def __init__(self, objects=(), children=()):
        self.objects = list(objects)
        self.children = list(children)


def world_with_background(color=(0.1, 0.2, 0.3, 1.0), strength=2.0):
    out = Node("OUTPUT_WORLD", name="World Output",
               inputs=[Socket("Surface")])
    bg = Node(
        "BACKGROUND", name="Background",
        inputs=[Socket("Color", list(color)), Socket("Strength", strength)],
        outputs=[Socket("Background")],
    )
    tree = NodeTree([out, bg])
    tree.links.new(out.inputs["Surface"], bg.outputs["Background"])
    return type("World", (), {"node_tree": tree})()


class Scene:
    def __init__(self, objects, camera=None, world=None, res=(640, 480)):
        self.objects = list(objects)
        self.camera = camera
        self.collection = Collection(objects)
        self.render = Render(res)
        self.world = world or world_with_background()


class Depsgraph:
    pass
