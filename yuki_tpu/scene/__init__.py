"""Scene layer: device scene arrays, builder, and loaders."""

from .data import (
    Scene,
    SceneBuilder,
    SceneData,
    SceneMeta,
    MAT_GLASS,
    MAT_GLOSSY,
    MAT_MATTE,
    MAT_METAL,
    LIGHT_DISTANT,
    LIGHT_POINT,
    LIGHT_RECT,
    LIGHT_SPOT,
)
from .cornell import cornell

__all__ = [
    "Scene",
    "SceneBuilder",
    "SceneData",
    "SceneMeta",
    "cornell",
    "MAT_MATTE",
    "MAT_GLASS",
    "MAT_METAL",
    "MAT_GLOSSY",
    "LIGHT_POINT",
    "LIGHT_SPOT",
    "LIGHT_RECT",
    "LIGHT_DISTANT",
]
