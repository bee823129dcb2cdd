"""High-level model objects built from the ops/pipelines layers."""

from vbr_tpu.models.visual_hull import VisualHull  # noqa: F401
