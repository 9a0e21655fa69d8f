"""Data pipeline: datasets, mixers, readers, transforms, loader."""
from .base import BaseDataset, MultiviewDataset, load_annotation
from .file_readers import DirReader, TarReader, ZipReader, make_reader
from .loader import DataLoader, default_collate
from .mixers import JointDataset, ProbDataset
from .re10k import RealEstate10KDataset, RealEstate10KDatasetEval
from .scene_dirs import (
    AnnotatedScenesDataset,
    DL3DV10KDataset,
    MVImgNetDataset,
    ObjaverseDataset,
    UrbanGenDataset,
)
from .legacy import (
    BlenderRendersDataset,
    CO3DDataset,
    LegacyMixingDataset,
    OmniObject3DDataset,
    ShapeNetDataset,
)
from .t2i import Text2ImageDataset, clean_caption

DATASET_REGISTRY = {
    "JointDataset": JointDataset,
    "ProbDataset": ProbDataset,
    "RealEstate10KDataset": RealEstate10KDataset,
    "RealEstate10KDatasetEval": RealEstate10KDatasetEval,
    "DL3DV10KDataset": DL3DV10KDataset,
    "MVImgNetDataset": MVImgNetDataset,
    "UrbanGenDataset": UrbanGenDataset,
    "ObjaverseDataset": ObjaverseDataset,
    "Text2ImageDataset": Text2ImageDataset,
    # legacy (Director3D-era GMLDM) formats — datasets/legacy.py
    "CO3DDataset": CO3DDataset,
    "BlenderRendersDataset": BlenderRendersDataset,
    "ShapeNetDataset": ShapeNetDataset,
    "OmniObject3DDataset": OmniObject3DDataset,
    "LegacyMixingDataset": LegacyMixingDataset,
}


def get_dataset(name: str):
    key = name.rsplit(".", 1)[-1]
    if key not in DATASET_REGISTRY:
        raise KeyError(f"unknown dataset '{name}' "
                       f"(registry: {sorted(DATASET_REGISTRY)})")
    return DATASET_REGISTRY[key]
