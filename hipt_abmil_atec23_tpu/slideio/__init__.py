"""Slide I/O: native pyramidal TIFF engine, tissue segmentation, patching."""

from hipt_abmil_atec23_tpu.slideio.reader import open_slide, TiffSlide, ImageSlide
from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue, SegmentationResult
from hipt_abmil_atec23_tpu.slideio.patching import enumerate_coords, save_coords_h5
