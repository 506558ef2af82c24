"""Slide I/O tests: native reader/writer, segmentation, patching, stitch
(SURVEY.md §4 plan #2: golden tests on synthetic pyramidal slides)."""
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, stub_reference_deps

from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.reader import open_slide, TiffSlide, ImageSlide
from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue, SegmentationResult, draw_segmentation
from hipt_abmil_atec23_tpu.slideio.patching import (
    enumerate_coords, enumerate_contour_coords, save_coords_h5, load_coords_h5,
    coords_attrs)
from hipt_abmil_atec23_tpu.slideio.stitch import stitch_coords
from hipt_abmil_atec23_tpu.slideio.synthetic import (
    make_tissue_image, write_synthetic_slide)
from hipt_abmil_atec23_tpu.utils.config import SegConfig, TileConfig


@pytest.fixture(scope="module")
def slide_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("slides")
    path = str(d / "synth.tif")
    img = write_synthetic_slide(path, 3072, 2048, n_levels=4,
                                compression=native.COMPRESSION_DEFLATE, seed=3)
    return path, img


def test_native_roundtrip_lossless(slide_file):
    path, img = slide_file
    s = TiffSlide(path)
    assert s.level_count == 4
    assert s.dimensions == (3072, 2048)
    region = s.read_region((512, 256), 0, (320, 240))
    np.testing.assert_array_equal(region, img[256:496, 512:832])
    # level-1 read with level-0 location semantics (openslide-style)
    lvl1 = s.read_region((512, 256), 1, (64, 64))
    assert lvl1.shape == (64, 64, 3)
    # out-of-bounds reads are white-padded
    edge = s.read_region((3000, 1990), 0, (128, 128))
    assert (edge[:, 100:] == 255).all()
    s.close()


def test_native_batched_matches_single(slide_file):
    path, img = slide_file
    s = TiffSlide(path)
    rng = np.random.default_rng(0)
    coords = np.stack([rng.integers(0, 2800, 32), rng.integers(0, 1800, 32)],
                      axis=1).astype(np.int64)
    batch = s.read_regions(coords, 0, (256, 256), n_threads=8)
    for i, c in enumerate(coords):
        np.testing.assert_array_equal(
            batch[i], s.read_region((int(c[0]), int(c[1])), 0, (256, 256)))
    s.close()


def test_jpeg_pyramid_reads(tmp_path):
    path = str(tmp_path / "jpeg.tif")
    img = write_synthetic_slide(path, 1024, 1024, n_levels=3,
                                compression=native.COMPRESSION_JPEG, seed=1)
    s = TiffSlide(path)
    region = s.read_region((128, 128), 0, (256, 256))
    # JPEG is lossy; structural agreement only
    err = np.abs(region.astype(int) - img[128:384, 128:384].astype(int)).mean()
    assert err < 8.0, err
    s.close()


def test_image_slide_padding():
    img = np.full((1000, 900, 3), 200, np.uint8)
    s = ImageSlide(img, pad_to=4096)
    assert s.dimensions == (4096, 4096)
    r = s.read_region((3500, 3500), 0, (64, 64))
    assert (r == 255).all()  # white pad region


def test_segmentation_finds_tissue_and_holes(slide_file):
    path, img = slide_file
    s = TiffSlide(path)
    seg = segment_tissue(s, SegConfig(seg_level=-1, sthresh=8, use_otsu=True,
                                      close=4, a_t=1, a_h=1))
    assert len(seg.contours) >= 1
    # contours are in level-0 coordinates
    allpts = np.concatenate([c.reshape(-1, 2) for c in seg.contours])
    assert allpts[:, 0].max() <= 3072 and allpts[:, 1].max() <= 2048
    overlay = draw_segmentation(s, seg)
    assert overlay.ndim == 3
    s.close()


def test_enumerate_coords_inside_tissue(slide_file, tmp_path):
    path, img = slide_file
    s = TiffSlide(path)
    seg = segment_tissue(s, SegConfig(use_otsu=True, close=4, a_t=1))
    cfg = TileConfig(patch_size=256, step_size=256, contour_fn="four_pt")
    coords = enumerate_coords(s, seg, cfg)
    assert len(coords) > 4
    # each kept patch must contain a reasonable fraction of tissue
    patches = s.read_regions(coords, 0, (256, 256))
    nonwhite = (patches.min(axis=-1) < 220).mean(axis=(1, 2))
    assert (nonwhite > 0.1).mean() > 0.9, nonwhite

    # h5 round-trip with reference schema
    h5 = str(tmp_path / "coords.h5")
    save_coords_h5(h5, coords, coords_attrs(s, cfg, "synth", str(tmp_path)))
    back, attrs = load_coords_h5(h5)
    np.testing.assert_array_equal(back, coords)
    assert attrs["patch_size"] == 256 and attrs["patch_level"] == 0
    s.close()


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_contour_fn_parity_with_reference(slide_file):
    """Vectorized mask-based checks vs the reference's pointPolygonTest
    functors; boundary-straddling candidates may differ by <= 2%."""
    stub_reference_deps()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from wsi_core.util_classes import (
            isInContourV3_Easy, isInContourV3_Hard, isInContourV2, isInContourV1)
    finally:
        sys.path.remove(REFERENCE_DIR)

    path, img = slide_file
    s = TiffSlide(path)
    seg = segment_tissue(s, SegConfig(use_otsu=True, close=4, a_t=1))
    cont, holes = seg.contours[0], seg.holes[0]

    ref_fns = {
        "four_pt": isInContourV3_Easy(contour=cont, patch_size=256,
                                      center_shift=0.5),
        "four_pt_hard": isInContourV3_Hard(contour=cont, patch_size=256,
                                           center_shift=0.5),
        "center": isInContourV2(contour=cont, patch_size=256),
        "basic": isInContourV1(contour=cont),
    }
    import cv2
    x0, y0, w, h = cv2.boundingRect(cont)
    xs = np.arange(x0, x0 + w, 256)
    ys = np.arange(y0, y0 + h, 256)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    cand = np.stack([gx.ravel(), gy.ravel()], axis=1)

    for name, ref_fn in ref_fns.items():
        cfg = TileConfig(patch_size=256, step_size=256, contour_fn=name)
        ours = enumerate_contour_coords(s, cont, [], cfg, mask_downsample=1.0)
        ours_set = set(map(tuple, ours.tolist()))
        ref_keep = {tuple(c.tolist()) for c in cand if ref_fn(c)}
        sym_diff = len(ours_set ^ ref_keep)
        assert sym_diff <= max(2, 0.02 * max(len(ref_keep), 1)), (
            name, sym_diff, len(ref_keep), len(ours_set))
    s.close()


def test_stitch(slide_file):
    path, img = slide_file
    s = TiffSlide(path)
    seg = segment_tissue(s, SegConfig(use_otsu=True, close=4, a_t=1))
    coords = enumerate_coords(s, seg, TileConfig())
    canvas = stitch_coords(s, coords, 256, downscale=8)
    assert canvas.shape[0] > 0 and (canvas.sum() > 0)
    s.close()


def test_openslide_fallback_backend(tmp_path, monkeypatch):
    """NDPI-style formats route to the import-guarded OpenSlideSlide
    (VERDICT r1 #9); absent openslide-python they raise a clear IOError."""
    import sys
    import types

    from hipt_abmil_atec23_tpu.slideio.reader import (
        OpenSlideSlide, open_slide)

    path = str(tmp_path / "scan.ndpi")
    open(path, "wb").write(b"\x00")

    # without the optional dependency: clear error, no crash
    monkeypatch.delitem(sys.modules, "openslide", raising=False)
    import builtins
    real_import = builtins.__import__

    def no_openslide(name, *a, **k):
        if name == "openslide":
            raise ImportError("no module named openslide")
        return real_import(name, *a, **k)
    monkeypatch.setattr(builtins, "__import__", no_openslide)
    with pytest.raises(IOError, match="openslide-python"):
        open_slide(path)
    monkeypatch.setattr(builtins, "__import__", real_import)

    # with a fake openslide: levels + RGBA->RGB composite work
    class FakePIL:
        def __init__(self, arr):
            self.arr = arr

        def convert(self, mode):
            assert mode == "RGB"
            return self.arr[:, :, :3]

    class FakeOS:
        level_dimensions = [(128, 64), (64, 32)]

        def read_region(self, loc, level, size):
            w, h = size
            arr = np.full((h, w, 4), 7, np.uint8)
            arr[0, 0, :3] = (loc[0] % 256, loc[1] % 256, level)
            return FakePIL(arr)

        def close(self):
            pass

    fake = types.ModuleType("openslide")
    fake.open_slide = lambda p: FakeOS()
    monkeypatch.setitem(sys.modules, "openslide", fake)
    slide = open_slide(path)
    assert isinstance(slide, OpenSlideSlide)
    assert slide.dimensions == (128, 64)
    assert slide.level_downsamples[1] == (2.0, 2.0)
    region = slide.read_region((10, 20), 1, (32, 16))
    assert region.shape == (16, 32, 3) and region.dtype == np.uint8
    assert tuple(region[0, 0]) == (10, 20, 1)
    batch = slide.read_regions(np.array([[0, 0], [10, 20]]), 0, (8, 8))
    assert batch.shape == (2, 8, 8, 3)
    slide.close()


def _write_j2k_tagged_tiff(path, comp_tag=65000):
    """Hand-craft a minimal tiled classic-TIFF whose ONE directory carries
    a compression tag the engine cannot decode: libtiff parses the IFD
    fine (no codec needed) and only a tile decode would fail — the failure
    mode real TCGA Aperio J2K .svs used to hit (VERDICT r4 weak #5). The
    Aperio tags 33003/33005 now decode natively via openjpeg
    (tests/test_j2k.py), so the default here is a private tag no codec
    will ever claim."""
    import struct

    entries = []  # (tag, type, count, value) — type 3=SHORT, 4=LONG

    def E(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    n_entries = 11
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    bits_off = data_off            # 3 SHORTs
    tile_off = data_off + 8        # fake tile payload
    E(256, 3, 1, 256)              # ImageWidth
    E(257, 3, 1, 256)              # ImageLength
    E(258, 3, 3, bits_off)         # BitsPerSample -> offset
    E(259, 3, 1, comp_tag)         # Compression: Aperio J2K
    E(262, 3, 1, 2)                # Photometric RGB
    E(277, 3, 1, 3)                # SamplesPerPixel
    E(284, 3, 1, 1)                # PlanarConfig contig
    E(322, 3, 1, 256)              # TileWidth
    E(323, 3, 1, 256)              # TileLength
    E(324, 4, 1, tile_off)         # TileOffsets
    E(325, 4, 1, 16)               # TileByteCounts
    buf = struct.pack("<2sHI", b"II", 42, ifd_off)
    buf += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        if typ == 3 and cnt == 1:
            buf += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += struct.pack("<HHII", tag, typ, cnt, val)
    buf += struct.pack("<I", 0)    # next IFD
    buf += struct.pack("<HHH", 8, 8, 8)
    buf += struct.pack("<H", 0)    # pad to tile_off
    buf += b"\x00" * 16            # fake (undecodable) tile bytes
    with open(path, "wb") as f:
        f.write(buf)


def test_unsupported_compression_rejected_at_open(tmp_path):
    """VERDICT r4 #2: a slide with an undecodable compression must fail AT
    OPEN with the compression named (so open_slide can route it), never
    open fine and then error mid-stream on the first tile decode."""
    from hipt_abmil_atec23_tpu.slideio.reader import (
        UnsupportedCompressionError)

    path = str(tmp_path / "weird_codec.svs")
    _write_j2k_tagged_tiff(path)
    with pytest.raises(UnsupportedCompressionError, match="65000"):
        TiffSlide(path)
    # supported compressions still open through the same check
    ok = str(tmp_path / "ok.tif")
    write_synthetic_slide(ok, 512, 512, n_levels=2,
                          compression=native.COMPRESSION_JPEG, seed=1)
    s = TiffSlide(ok)
    assert s.level_count >= 1
    s.close()


def test_open_slide_routes_unsupported_compression(tmp_path, monkeypatch):
    """open_slide on an undecodable-codec slide: OpenSlide fallback when
    available, a clear codec-naming error otherwise — never an ImageSlide
    degrade or a handle that cannot read."""
    import sys
    import types

    path = str(tmp_path / "weird_codec.svs")
    _write_j2k_tagged_tiff(path)

    # without openslide: a clear error naming the codec + the remedy
    import builtins
    real_import = builtins.__import__

    def no_openslide(name, *a, **k):
        if name == "openslide":
            raise ImportError("no module named openslide")
        return real_import(name, *a, **k)
    monkeypatch.delitem(sys.modules, "openslide", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_openslide)
    with pytest.raises(IOError, match="openslide-python"):
        open_slide(path)
    with pytest.raises(IOError, match="65000"):
        open_slide(path)
    monkeypatch.setattr(builtins, "__import__", real_import)

    # with openslide present: the same file routes to the fallback backend
    from hipt_abmil_atec23_tpu.slideio.reader import OpenSlideSlide

    class FakeOS:
        level_dimensions = [(256, 256)]

        def close(self):
            pass

    fake = types.ModuleType("openslide")
    fake.open_slide = lambda p: FakeOS()
    monkeypatch.setitem(sys.modules, "openslide", fake)
    slide = open_slide(path)
    assert isinstance(slide, OpenSlideSlide)
    slide.close()
