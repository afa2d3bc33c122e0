"""Dataset readers (ModelNet / MVP / ShapeNet-multimodal), batching, fixtures."""

from .loader import BatchLoader
from .modelnet import (
    DEFAULT_SKIP_CLASSES,
    TRAIN_SKIP_INSTANCES,
    ModelNetCompletion,
    build_viewpoint_table,
    export_instance_ground_truths,
)
from .multimodal import SHAPENET_LABEL_DICT, MultiModalCompletion
from .mvp import MVP_LABEL_DICT, MVPCompletion
from .synthetic import (
    SYNTHETIC_CLASSES,
    make_modelnet_fixture,
    make_multimodal_fixture,
    make_mvp_fixture,
    make_shapes_fixture,
    synthetic_batch,
)

__all__ = [
    "BatchLoader",
    "ModelNetCompletion",
    "build_viewpoint_table",
    "DEFAULT_SKIP_CLASSES",
    "TRAIN_SKIP_INSTANCES",
    "export_instance_ground_truths",
    "MultiModalCompletion",
    "SHAPENET_LABEL_DICT",
    "MVPCompletion",
    "MVP_LABEL_DICT",
    "synthetic_batch",
    "make_modelnet_fixture",
    "make_shapes_fixture",
    "make_mvp_fixture",
    "make_multimodal_fixture",
    "SYNTHETIC_CLASSES",
]
