"""Model loaders (OBJ/MTL, glTF/GLB, COLLADA, FBX, PLY, STL, OFF) with
the reference's material mapping."""

from typing import Optional

from .gltf import load_gltf
from .collada import load_dae
from .fbx import load_fbx
from .mesh_formats import load_off, load_ply, load_stl
from .obj import load_obj


def load_model_scene(path: str, env=None, scale: float = 1.0):
    """Load a model file into a Scene (the analog of ``Scene::loadFromDisk``)."""
    from ..scene import SceneBuilder

    b = SceneBuilder()
    lights = []
    if path.endswith((".gltf", ".glb")):
        meshes, materials, lights = load_gltf(
            path, scale=scale, texture_sink=b.textures
        )
    elif path.endswith(".obj"):
        meshes, materials = load_obj(path, scale=scale)
    elif path.endswith(".ply"):
        meshes, materials = load_ply(path, scale=scale)
    elif path.endswith(".stl"):
        meshes, materials = load_stl(path, scale=scale)
    elif path.endswith(".off"):
        meshes, materials = load_off(path, scale=scale)
    elif path.endswith(".dae"):
        meshes, materials = load_dae(path, scale=scale)
    elif path.lower().endswith(".fbx"):
        meshes, materials = load_fbx(path, scale=scale)
    else:
        raise ValueError(f"unsupported model format: {path}")
    for mesh, mat in zip(meshes, materials):
        b.add_mesh(mesh, mat)
    from ..lights import DirectionalLight, PointLight, SpotLight

    for light in lights:
        if isinstance(light, DirectionalLight):
            b.add_directional_light(light)
        elif isinstance(light, PointLight):
            b.add_point_light(light)
        elif isinstance(light, SpotLight):
            b.add_spot_light(light)
    b.set_environment(env)
    return b.build()


__all__ = ["load_gltf", "load_obj", "load_ply", "load_stl", "load_off", "load_dae", "load_fbx", "load_model_scene"]
