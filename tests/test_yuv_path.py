"""Raw YCbCr 4:2:0 transfer path (native ws_read_regions_yuv420 +
ops/yuv.py device reconstruction): the host->device diet for TCGA-style
JPEG-YCbCr slides — 1.5 bytes/px on the wire instead of 3.

Parity oracle: libtiff's own full decode (read_regions), which runs
libjpeg's fancy chroma upsample + fixed-point JFIF color conversion. The
float reconstruction must match within a few LSB."""
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide


@pytest.fixture(scope="module")
def ycbcr_slide(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("yuv")
    path = str(tmp / "ycbcr.tif")
    img = write_synthetic_slide(path, 1024, 1024, n_levels=2, seed=3,
                                ycbcr420=True)
    slide = TiffSlide(path)
    yield slide, img
    slide.close()


def test_supports_probe(ycbcr_slide, tmp_path):
    slide, _ = ycbcr_slide
    assert slide.supports_yuv420(0)
    # plain RGB-JPEG slides do NOT support the raw path
    p = str(tmp_path / "rgb.tif")
    write_synthetic_slide(p, 512, 512, n_levels=1, seed=1)
    rgb = TiffSlide(p)
    assert not rgb.supports_yuv420(0)
    rgb.close()


def test_yuv_planes_reconstruct_to_libtiff_decode(ycbcr_slide):
    import jax
    from hipt_abmil_atec23_tpu.ops.yuv import yuv420_to_rgb

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [256, 256], [512, 128], [768, 768]])
    ref = slide.read_regions(coords, 0, (256, 256))       # libjpeg decode
    yp, cb, cr = slide.read_regions_yuv420(coords, 0, (256, 256))
    assert yp.shape == (4, 256, 256) and cb.shape == (4, 128, 128)
    got = np.asarray(jax.jit(yuv420_to_rgb)(yp, cb, cr))
    diff = np.abs(got - ref.astype(np.float32))
    # small float-vs-fixed-point differences; identical structure
    assert diff.mean() < 1.0, diff.mean()
    assert np.quantile(diff, 0.99) <= 4.0, np.quantile(diff, 0.99)


def test_yuv_region_boundary_padding(ycbcr_slide):
    import jax
    from hipt_abmil_atec23_tpu.ops.yuv import yuv420_to_rgb

    slide, _ = ycbcr_slide
    # region hanging off the slide edge pads white, like the RGB path
    coords = np.array([[896, 896]])
    ref = slide.read_regions(coords, 0, (256, 256))
    yp, cb, cr = slide.read_regions_yuv420(coords, 0, (256, 256))
    got = np.asarray(jax.jit(yuv420_to_rgb)(yp, cb, cr))
    assert np.all(got[0, 200:, 200:] > 250)  # off-slide area is white
    diff = np.abs(got - ref.astype(np.float32))
    assert diff.mean() < 1.0, diff.mean()


def test_yuv_odd_level_edge_matches_rgb_white_fill(tmp_path):
    """Odd-dimension levels end mid-2x2-unit: the codec's edge-replica
    bytes must NOT overwrite the off-slide white strip the RGB path leaves
    (regression: decode_tile_yuv420 bounded only by region w/h, not x1/y1).
    """
    import jax
    from hipt_abmil_atec23_tpu.ops.yuv import yuv420_to_rgb

    p = str(tmp_path / "odd.tif")
    write_synthetic_slide(p, 1021, 1021, n_levels=1, seed=7, ycbcr420=True)
    slide = TiffSlide(p)
    try:
        assert slide.supports_yuv420(0)
        coords = np.array([[960, 960]])  # 64x64 region straddling both edges
        ref = slide.read_regions(coords, 0, (64, 64))
        yp, cb, cr = slide.read_regions_yuv420(coords, 0, (64, 64))
        # rows/cols past the 1021-px edge (region index >= 61) stay white
        assert np.all(ref[0, 61:] == 255) and np.all(ref[0, :, 61:] == 255)
        assert np.all(yp[0, 61:] == 255), "Y edge strip not white"
        assert np.all(yp[0, :, 61:] == 255), "Y edge column not white"
        got = np.asarray(jax.jit(yuv420_to_rgb)(yp, cb, cr))
        diff = np.abs(got - ref.astype(np.float32))
        assert diff.mean() < 2.0, diff.mean()
    finally:
        slide.close()


def test_encode_stream_abandoned_consumer_cleans_up(ycbcr_slide):
    """Breaking out of an encode_stream iteration must not leave the H2D
    transfer thread parked on the bounded queue holding device batches
    (regression: generator abandonment leaked the thread + HBM refs)."""
    import threading

    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    import time

    slide, _ = ycbcr_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=1,
                                      dtype="float32"))
    coords = np.array([[0, 0], [256, 0], [0, 256], [256, 256],
                       [512, 0], [0, 512], [512, 512], [256, 768]])
    # warm-up full drain (compiles; any persistent pool threads spin up)
    list(encode_stream([("w", slide, coords[:2])], enc))
    before = threading.active_count()

    gen = encode_stream([("a", slide, coords), ("b", slide, coords)], enc)
    sid, feats = next(gen)  # slide a completes; slide b is mid-pipeline
    assert sid == "a" and feats.shape == (len(coords), enc.feat_dim)
    gen.close()  # what GC does when a consumer raises/breaks mid-iteration

    # the finally-cleanup must stop the transfer + decode threads
    deadline = time.monotonic() + 10.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before, "leaked pipeline threads"


def test_encode_stream_uses_yuv_and_matches_rgb(ycbcr_slide, tmp_path):
    """The stream pipeline auto-detects the 4:2:0 slide, ships planes, and
    produces features matching the RGB transfer path."""
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    slide, _ = ycbcr_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=2,
                                      dtype="float32"))
    assert enc.apply_yuv is not None
    coords = np.array([[0, 0], [256, 0], [0, 256], [512, 512], [256, 768]])

    outs = dict(encode_stream([("a", slide, coords)], enc))
    want = dict(encode_stream([("a", slide, coords)], enc,
                              transform=lambda x: x))  # forces RGB path
    assert outs["a"].shape == want["a"].shape == (5, enc.feat_dim)
    np.testing.assert_allclose(outs["a"], want["a"], rtol=5e-2, atol=5e-2)
    # features respond to the actual pixel content (not blank)
    assert np.abs(outs["a"]).max() > 0.01


def test_encode_stream_noop_target_patch_size_keeps_fast_path(ycbcr_slide):
    """target_patch_size equal to the region size is a no-op resize and
    must NOT disable the compressed transfer paths (the pipeline is
    wire-bound; falling back to RGB would 2-6x the H2D bytes for
    identical output). Either compressed format (sparse DCT or raw
    planes) counts; decoded RGB must never ship."""
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    class CountingSlide:
        def __init__(self, s):
            self._s = s
            self.fast_calls = 0
            self.rgb_calls = 0

        def __getattr__(self, k):
            return getattr(self._s, k)

        def read_regions_yuv420(self, *a, **kw):
            self.fast_calls += 1
            return self._s.read_regions_yuv420(*a, **kw)

        def read_regions_dct(self, *a, **kw):
            self.fast_calls += 1
            return self._s.read_regions_dct(*a, **kw)

        def read_regions(self, *a, **kw):
            self.rgb_calls += 1
            return self._s.read_regions(*a, **kw)

    slide, _ = ycbcr_slide
    proxy = CountingSlide(slide)
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=2,
                                      dtype="float32"))
    coords = np.array([[0, 0], [256, 0], [0, 256]])
    outs = dict(encode_stream([("a", proxy, coords)], enc, region_size=256,
                              target_patch_size=256))
    assert proxy.fast_calls > 0  # compressed bytes despite the no-op flag
    assert proxy.rgb_calls == 0  # decoded pixels never shipped
    want = dict(encode_stream([("a", slide, coords)], enc, region_size=256))
    np.testing.assert_allclose(outs["a"], want["a"], rtol=1e-5, atol=1e-5)


def test_encode_stream_staged_yuv(ycbcr_slide, tmp_path):
    """stage=True over a mixed yuv+rgb stream: the staged phase transfers
    raw planes, AOT-compiles BOTH entry kinds, and matches the overlapped
    stream's features."""
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    yslide, _ = ycbcr_slide
    p = str(tmp_path / "rgb3.tif")
    write_synthetic_slide(p, 512, 512, n_levels=1, seed=6)
    rgb = TiffSlide(p)
    try:
        enc = build_encoder(EncoderConfig(model_type="resnet18",
                                          batch_size=2, dtype="float32"))
        jobs = [("yuv", yslide, np.array([[0, 0], [256, 256], [512, 0]])),
                ("rgb", rgb, np.array([[0, 0], [256, 256]]))]
        ref = dict(encode_stream(jobs, enc))
        got = dict(encode_stream(jobs, enc, stage=True))
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)
    finally:
        rgb.close()


def test_encode_stream_mixed_yuv_and_rgb_slides(ycbcr_slide, tmp_path):
    """One stream over a 4:2:0 slide AND a plain RGB-JPEG slide: per-slide
    transfer formats coexist; both yield correct-shaped features."""
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    yslide, _ = ycbcr_slide
    p = str(tmp_path / "rgb2.tif")
    write_synthetic_slide(p, 512, 512, n_levels=1, seed=5)
    rgb = TiffSlide(p)
    try:
        enc = build_encoder(EncoderConfig(model_type="resnet18",
                                          batch_size=2, dtype="float32"))
        coords_y = np.array([[0, 0], [256, 256], [512, 0]])
        coords_r = np.array([[0, 0], [256, 256]])
        outs = dict(encode_stream([("yuv", yslide, coords_y),
                                   ("rgb", rgb, coords_r)], enc))
        assert outs["yuv"].shape == (3, enc.feat_dim)
        assert outs["rgb"].shape == (2, enc.feat_dim)
        # the RGB slide's features equal a direct RGB encode
        import jax.numpy as jnp
        want = np.asarray(enc.apply(jnp.asarray(
            rgb.read_regions(coords_r, 0, (256, 256)))))
        np.testing.assert_allclose(outs["rgb"], want, rtol=1e-5, atol=1e-5)
    finally:
        rgb.close()
