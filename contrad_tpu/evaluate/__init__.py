"""Evaluation: FID/IS, visual diagnostics, classifier metrics."""

from contrad_tpu.evaluate.visual import (
    FixedSampleGeneration,
    ImageGrid,
    make_grid,
    to_uint8,
)

__all__ = ["FixedSampleGeneration", "ImageGrid", "make_grid", "to_uint8"]
