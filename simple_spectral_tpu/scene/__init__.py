from simple_spectral_tpu.scene.types import SceneData, Camera, MaterialTable
from simple_spectral_tpu.scene.library import build_scene, SCENE_NAMES

__all__ = ["SceneData", "Camera", "MaterialTable", "build_scene", "SCENE_NAMES"]
