"""Headless-Blender RGBAD renderer for meshes (dataset prep / eval renders).

Functional equivalent of ``/root/reference/evals/scripts/blender_script.py``:
render a 3D model from multiple camera poses into per-channel 16-bit PNGs
(R, G, B, alpha, depth) plus per-view camera-metadata JSON and a global
info.json. ``--camera_pose z-circular-elevated`` reproduces the pose ring
used for CLIP R-Precision evaluation.

Run inside Blender (bpy is only available there):

    blender -b -P scripts/blender_render.py -- \
        --input_path model.ply --output_path render_out \
        --num_images 20 --camera_pose z-circular-elevated

This is a host-side offline tool; it is exercised only where Blender is
installed.
"""

import argparse
import json
import math
import os
import random
import sys

try:
    import bpy
    from mathutils import Vector
    from mathutils.noise import random_unit_vector
except ImportError as e:  # pragma: no cover - requires Blender
    raise RuntimeError(
        "this script must be run inside Blender: blender -b -P blender_render.py -- ..."
    ) from e

MAX_DEPTH = 5.0
FORMAT_VERSION = 6
# fixed direction decorrelated from the axes, as in the reference renders
UNIFORM_LIGHT_DIRECTION = [0.09387503, -0.63953443, -0.7630093]

IMPORTERS = {
    ".obj": lambda p: bpy.ops.import_scene.obj(filepath=p),
    ".glb": lambda p: bpy.ops.import_scene.gltf(filepath=p),
    ".gltf": lambda p: bpy.ops.import_scene.gltf(filepath=p),
    ".stl": lambda p: bpy.ops.import_mesh.stl(filepath=p),
    ".fbx": lambda p: bpy.ops.import_scene.fbx(filepath=p),
    ".dae": lambda p: bpy.ops.wm.collada_import(filepath=p),
    ".ply": lambda p: bpy.ops.import_mesh.ply(filepath=p),
}


def clear_scene():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()


def clear_lights():
    bpy.ops.object.select_all(action="DESELECT")
    for obj in bpy.context.scene.objects.values():
        if isinstance(obj.data, bpy.types.Light):
            obj.select_set(True)
    bpy.ops.object.delete()


def import_model(path):
    clear_scene()
    ext = os.path.splitext(path)[1].lower()
    if ext not in IMPORTERS:
        raise RuntimeError(f"unexpected extension: {ext}")
    IMPORTERS[ext](path)


def scene_meshes():
    for obj in bpy.context.scene.objects.values():
        if isinstance(obj.data, (bpy.types.Mesh,)):
            yield obj


def scene_roots():
    for obj in bpy.context.scene.objects.values():
        if not obj.parent:
            yield obj


def scene_bbox():
    lo = Vector((math.inf,) * 3)
    hi = Vector((-math.inf,) * 3)
    for obj in scene_meshes():
        for corner in obj.bound_box:
            world = obj.matrix_world @ Vector(corner)
            lo = Vector(map(min, lo, world))
            hi = Vector(map(max, hi, world))
    return lo, hi


def normalize_scene():
    """Scale the scene into the unit cube centered at the origin."""
    lo, hi = scene_bbox()
    scale = 1.0 / max(hi - lo)
    for obj in scene_roots():
        obj.scale = obj.scale * scale
    bpy.context.view_layer.update()
    lo, hi = scene_bbox()
    offset = -(lo + hi) / 2
    for obj in scene_roots():
        obj.matrix_world.translation += offset
    bpy.ops.object.select_all(action="DESELECT")


def create_camera():
    cam_data = bpy.data.cameras.new(name="Camera")
    cam = bpy.data.objects.new("Camera", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam


def set_camera(direction, camera_dist=2.0):
    cam = bpy.context.scene.camera
    cam.location = -camera_dist * direction
    cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
    bpy.context.view_layer.update()


def place_camera(time, mode, dist_min, dist_max):
    dist = random.uniform(dist_min, dist_max)
    if mode == "random":
        set_camera(random_unit_vector(), camera_dist=dist)
        return
    elevation = {"z-circular": -0.1, "z-circular-elevated": 0.2617993878}[mode]
    angle = time * math.pi * 2
    direction = Vector(
        (-math.cos(angle), -math.sin(angle), -elevation)
    ).normalized()
    set_camera(direction, camera_dist=dist)


def create_light(location, energy=1.0, angle=0.5 * math.pi / 180):
    data = bpy.data.lights.new(name="Light", type="SUN")
    data.energy = energy
    data.angle = angle
    light = bpy.data.objects.new(name="Light", object_data=data)
    light.rotation_euler = (-location).to_track_quat("-Z", "Y").to_euler()
    bpy.context.collection.objects.link(light)
    light.location = location
    bpy.context.view_layer.update()


def setup_lights(mode, backend):
    clear_lights()
    if mode == "random":
        for _ in range(4):
            create_light(random_unit_vector() * 2.0, energy=1.5)
    elif mode == "camera":
        create_light(bpy.context.scene.camera.location, energy=5.0)
    elif mode == "uniform":
        pos = Vector(UNIFORM_LIGHT_DIRECTION)
        angle = 0.0092 if backend == "CYCLES" else math.pi
        create_light(pos, energy=5.0, angle=angle)
        create_light(-pos, energy=5.0, angle=angle)
    else:
        raise ValueError(f"unknown light mode: {mode}")


def setup_vertex_color_materials():
    """Route vertex colors to emission so colors survive flat rendering."""
    for obj in scene_meshes():
        if not obj.data.vertex_colors:
            continue
        mat = bpy.data.materials.new(name="VertexColor")
        mat.use_nodes = True
        tree = mat.node_tree
        tree.nodes.clear()
        attr = tree.nodes.new("ShaderNodeVertexColor")
        emit = tree.nodes.new("ShaderNodeEmission")
        out = tree.nodes.new("ShaderNodeOutputMaterial")
        tree.links.new(attr.outputs["Color"], emit.inputs["Color"])
        tree.links.new(emit.outputs["Emission"], out.inputs["Surface"])
        obj.data.materials.clear()
        obj.data.materials.append(mat)


def setup_depth_output(output_dir, view_idx):
    """Compositor graph writing normalized depth + RGBA as 16-bit PNGs."""
    scene = bpy.context.scene
    scene.use_nodes = True
    scene.view_layers["ViewLayer"].use_pass_z = True
    tree = scene.node_tree
    tree.nodes.clear()
    layers = tree.nodes.new("CompositorNodeRLayers")

    # depth normalized to [0, 1] over MAX_DEPTH
    divide = tree.nodes.new("CompositorNodeMath")
    divide.operation = "DIVIDE"
    divide.inputs[1].default_value = MAX_DEPTH
    tree.links.new(layers.outputs["Depth"], divide.inputs[0])
    clamp = tree.nodes.new("CompositorNodeMath")
    clamp.operation = "MINIMUM"
    clamp.inputs[1].default_value = 1.0
    tree.links.new(divide.outputs[0], clamp.inputs[0])

    out = tree.nodes.new("CompositorNodeOutputFile")
    out.base_path = output_dir
    out.format.file_format = "PNG"
    out.format.color_depth = "16"
    out.file_slots.clear()
    for name, src in (
        ("rgba", layers.outputs["Image"]),
        ("depth", clamp.outputs[0]),
    ):
        slot = out.file_slots.new(f"{view_idx:05d}_{name}_")
        tree.links.new(src, out.inputs[-1])


def scene_fov():
    cam = bpy.context.scene.camera.data
    x = cam.angle_x if hasattr(cam, "angle_x") else cam.angle
    y = cam.angle_y if hasattr(cam, "angle_y") else cam.angle
    return x, y


def write_camera_metadata(path):
    cam = bpy.context.scene.camera
    x_fov, y_fov = scene_fov()
    matrix = cam.matrix_world
    with open(path, "w") as f:
        json.dump(
            dict(
                format_version=FORMAT_VERSION,
                max_depth=MAX_DEPTH,
                origin=list(matrix.translation),
                x_fov=x_fov,
                y_fov=y_fov,
                x=list((matrix.to_3x3() @ Vector((1, 0, 0))).normalized()),
                y=list((matrix.to_3x3() @ Vector((0, -1, 0))).normalized()),
                z=list((matrix.to_3x3() @ Vector((0, 0, -1))).normalized()),
            ),
            f,
        )


def main():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else sys.argv[1:]
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--num_images", type=int, default=20)
    parser.add_argument("--backend", default="BLENDER_EEVEE")
    parser.add_argument("--light_mode", default="uniform",
                        choices=["random", "uniform", "camera"])
    parser.add_argument("--camera_pose", default="random",
                        choices=["random", "z-circular", "z-circular-elevated"])
    parser.add_argument("--camera_dist_min", type=float, default=2.0)
    parser.add_argument("--camera_dist_max", type=float, default=2.0)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    random.seed(args.seed)
    os.makedirs(args.output_path, exist_ok=True)

    import_model(args.input_path)
    normalize_scene()
    setup_vertex_color_materials()
    create_camera()

    scene = bpy.context.scene
    scene.render.engine = args.backend
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.film_transparent = True

    for i in range(args.num_images):
        t = i / max(args.num_images, 1)
        place_camera(t, args.camera_pose, args.camera_dist_min,
                     args.camera_dist_max)
        setup_lights(args.light_mode, args.backend)
        setup_depth_output(args.output_path, i)
        bpy.ops.render.render(write_still=False)
        write_camera_metadata(os.path.join(args.output_path, f"{i:05d}.json"))

    with open(os.path.join(args.output_path, "info.json"), "w") as f:
        json.dump(
            dict(
                format_version=FORMAT_VERSION,
                backend=args.backend,
                light_mode=args.light_mode,
                camera_pose=args.camera_pose,
                num_images=args.num_images,
                resolution=args.resolution,
            ),
            f,
        )


if __name__ == "__main__":
    main()
