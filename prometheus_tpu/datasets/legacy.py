"""Legacy (Director3D-era) dataset formats for the GM-LDM path.

Parity target: ``/root/reference/prometheus/datasets/legacy/`` (~3.7k LoC:
co3d.py on pytorch3d's JsonIndexDataset, shapenet.py / omniobject3d.py with
blender->ngp pose surgery, laion.py, objaverse.py, mixing.py). Kept in the
reference for checkpoint compat of the legacy GMLDM systems; here the same
capabilities reduce to thin subclasses of the generic annotated-scene reader
plus format converters:

- CO3D: ``tools/build_metadata.py co3d`` parses ``frame_annotations.jgz``
  (gzipped JSON — no pytorch3d) into the annotation format; ``CO3DDataset``
  reads it (OpenCV poses, category name as caption).
- ShapeNet / OmniObject3D: ``tools/build_metadata.py blender`` converts
  ``transforms.json`` object renders (blender c2w is already
  OpenGL-convention; no ngp axis-cycling needed because the camera
  normalization in ``MultiviewDataset.process_cameras`` is
  first-frame-relative).
- LAION-style 2D (legacy ``laion.py``): covered by
  ``Text2ImageDataset`` — same annotation-list-of-captioned-images shape.
- ``MixingDataset`` (3D scene + 2D batch per item, legacy ``mixing.py``):
  covered by ``JointDataset``'s dict merge; ``LegacyMixingDataset`` wires
  the conventional (objaverse-like, t2i) pair for GMLDM training configs.
"""
from __future__ import annotations

from .mixers import JointDataset
from .scene_dirs import AnnotatedScenesDataset
from .t2i import Text2ImageDataset


class CO3DDataset(AnnotatedScenesDataset):
    """CO3D sequences via the converted ``frame_annotations.jgz`` annotation
    (reference ``datasets/legacy/co3d.py``; object-centric, OpenCV poses)."""

    pose_convention = "opencv"

    def __init__(self, root_dir: str, **kw):
        kw.setdefault("dataset_name", "CO3D")
        super().__init__(root_dir, **kw)


class BlenderRendersDataset(AnnotatedScenesDataset):
    """Blender/NeRF-synthetic object renders via the ``blender`` annotation
    (reference ``datasets/legacy/{shapenet,omniobject3d}.py``)."""

    pose_convention = "opengl"

    def __init__(self, root_dir: str, **kw):
        kw.setdefault("dataset_name", "BlenderRenders")
        kw.setdefault("sample_rate", -1)   # random views (object-centric)
        super().__init__(root_dir, **kw)


class ShapeNetDataset(BlenderRendersDataset):
    def __init__(self, root_dir: str, **kw):
        kw.setdefault("dataset_name", "ShapeNetCar")
        super().__init__(root_dir, **kw)


class OmniObject3DDataset(BlenderRendersDataset):
    def __init__(self, root_dir: str, **kw):
        kw.setdefault("dataset_name", "OmniObject3D")
        super().__init__(root_dir, **kw)


class LegacyMixingDataset(JointDataset):
    """One item = {3D multiview scene} ∪ {2D captioned images} — the GMLDM
    training batch shape of reference ``datasets/legacy/mixing.py``."""

    def __init__(self, objaverse_kwargs: dict, t2i_kwargs: dict,
                 fake_length: int = -1, **common):
        from .scene_dirs import ObjaverseDataset

        mv = ObjaverseDataset(**{**common, **objaverse_kwargs})
        sv = Text2ImageDataset(**{**common, **t2i_kwargs})
        super().__init__([mv, sv], fake_length=fake_length)
