"""J2K raw-plane transfer rung (Aperio subsampled-YCC .svs).

Real Aperio JPEG2000 .svs (TIFF compression 33003) store YCC components
with subsampled chroma (comp dx=2, dy 1 or 2 — 4:2:2 / 4:2:0). The native
engine probes that layout (ws_yuv_layout) and ships the codec's planes
verbatim (ws_read_regions_planes: 2.0 / 1.5 bytes per pixel instead of
RGB's 3) for the device to reconstruct (ops/yuv.py yuv_planes_to_rgb) —
the same host-link diet the JPEG 4:2:0 path gets. Replaces the decode
half of reference extract_features_fp.py:144-171 on OpenSlide-read
Aperio slides.

Fixtures: no Python encoder in this image can produce subsampled J2K
components (Pillow writes full-resolution only), so tiles are encoded by
the native test-fixture encoder ws_j2k_encode_planes (lossless 5/3
reversible, no MCT) — plane reads must therefore be BIT-exact."""
import ctypes

import numpy as np
import pytest

from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide

from test_j2k import needs_openjpeg, write_tiled_tiff_raw

SYCC = 3  # OPJ_CLRSPC_SYCC


def _encode_planes(y, cb, cr, sh, sv, color_space=SYCC) -> bytes:
    """One lossless J2K codestream from uint8 YCC planes via the native
    fixture encoder. Skips the test when the opj_cparameters fingerprint
    does not resolve on this libopenjp2 build (returns -2)."""
    lib = native.get_lib()
    y = np.ascontiguousarray(y, np.uint8)
    cb = np.ascontiguousarray(cb, np.uint8)
    cr = np.ascontiguousarray(cr, np.uint8)
    h, w = y.shape
    cap = y.size * 4 + 65536
    out = np.empty(cap, np.uint8)
    n = lib.ws_j2k_encode_planes(
        w, h, sh, sv,
        y.ctypes.data_as(ctypes.c_void_p), cb.ctypes.data_as(ctypes.c_void_p),
        cr.ctypes.data_as(ctypes.c_void_p), color_space,
        out.ctypes.data_as(ctypes.c_void_p), cap)
    if n == -2:
        pytest.skip("opj_cparameters fingerprint miss on this libopenjp2")
    assert n > 0, f"fixture encode failed ({n})"
    return bytes(out[:n])


def _planes(rng, h, w, sh, sv):
    """Random full-image planes at a chroma layout."""
    y = rng.randint(0, 256, (h, w), dtype=np.uint8)
    cb = rng.randint(0, 256, (h // sv, w // sh), dtype=np.uint8)
    cr = rng.randint(0, 256, (h // sv, w // sh), dtype=np.uint8)
    return y, cb, cr


def _write_plane_svs(path, y, cb, cr, sh, sv, tile=256):
    """Tiled 33003 .svs whose tile codestreams hold slices of the given
    full-image planes."""
    h, w = y.shape
    tiles = []
    for ty in range(h // tile):
        for tx in range(w // tile):
            ys = y[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            cs = (slice(ty * tile // sv, (ty + 1) * tile // sv),
                  slice(tx * tile // sh, (tx + 1) * tile // sh))
            tiles.append(_encode_planes(ys, cb[cs], cr[cs], sh, sv))
    write_tiled_tiff_raw(path, 33003, w, h, tile, tiles)


@needs_openjpeg
@pytest.mark.parametrize("sv,layout", [(2, (2, 2)), (1, (2, 1))])
def test_plane_probe_and_bit_exact_reads(tmp_path, sv, layout):
    """Layout probe + batched plane reads on 4:2:0 / 4:2:2 fixtures:
    lossless reversible codestreams with no MCT round-trip the planes
    BIT-exactly through encode -> TIFF -> threaded region read."""
    rng = np.random.RandomState(13 + sv)
    W = H = 512
    y, cb, cr = _planes(rng, H, W, 2, sv)
    path = str(tmp_path / "planes.svs")
    _write_plane_svs(path, y, cb, cr, 2, sv)

    s = TiffSlide(path)
    assert s.yuv_layout(0) == layout
    # full-slide read
    yp, cbp, crp = s.read_regions_planes([[0, 0]], 0, (W, H))
    np.testing.assert_array_equal(yp[0], y)
    np.testing.assert_array_equal(cbp[0], cb)
    np.testing.assert_array_equal(crp[0], cr)
    # cross-tile + batched reads (even coords)
    coords = np.array([[128, 192], [256, 256], [2, 510]])
    yp, cbp, crp = s.read_regions_planes(coords, 0, (128, 128))
    for i, (x0, y0) in enumerate(coords):
        # off-edge rows/cols are white (Y=255, chroma=128)
        ye = np.full((128, 128), 255, np.uint8)
        cbe = np.full((128 // sv, 64), 128, np.uint8)
        cre = cbe.copy()
        yv = y[y0:y0 + 128, x0:x0 + 128]
        ye[:yv.shape[0], :yv.shape[1]] = yv
        cv = (slice(y0 // sv, (y0 + 128) // sv), slice(x0 // 2, (x0 + 128) // 2))
        cbe[:cb[cv].shape[0], :cb[cv].shape[1]] = cb[cv]
        cre[:cr[cv].shape[0], :cr[cv].shape[1]] = cr[cv]
        np.testing.assert_array_equal(yp[i], ye)
        np.testing.assert_array_equal(cbp[i], cbe)
        np.testing.assert_array_equal(crp[i], cre)
    s.close()


@needs_openjpeg
def test_fullres_j2k_has_no_plane_path(tmp_path):
    """Pillow-encoded J2K (full-resolution components, dx=dy=1) must probe
    to None — shipping three full planes saves nothing over RGB."""
    from test_j2k import _j2k_codestream
    rng = np.random.RandomState(3)
    img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "fullres.svs")
    write_tiled_tiff_raw(path, 33005, 256, 256, 256, [_j2k_codestream(img)])
    s = TiffSlide(path)
    assert s.yuv_layout(0) is None
    with pytest.raises(IOError):
        s.read_regions_planes([[0, 0]], 0, (64, 64))
    s.close()


def test_jpeg_slide_probes_420_layout(tmp_path):
    """The generic probe answers (2, 2) for JPEG YCbCr 4:2:0 levels (the
    existing raw path) and routes read_regions_planes through it."""
    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide
    path = str(tmp_path / "jpeg.tif")
    write_synthetic_slide(path, 512, 512, n_levels=1, ycbcr420=True)
    s = TiffSlide(path)
    if not s.supports_yuv420(0):
        s.close()
        pytest.skip("libtiff JPEG raw-plane path unavailable")
    assert s.yuv_layout(0) == (2, 2)
    yp, cb, cr = s.read_regions_planes([[0, 0], [256, 256]], 0, (256, 256))
    yw, cbw, crw = s.read_regions_yuv420([[0, 0], [256, 256]], 0, (256, 256))
    np.testing.assert_array_equal(yp, yw)
    np.testing.assert_array_equal(cb, cbw)
    np.testing.assert_array_equal(cr, crw)
    s.close()


def test_yuv422_to_rgb_matches_reference():
    """Device 4:2:2 reconstruction == numpy fancy h2v1 upsample + BT.601."""
    import jax

    from hipt_abmil_atec23_tpu.ops.yuv import yuv422_to_rgb

    rng = np.random.RandomState(7)
    y = rng.randint(0, 256, (2, 16, 32), dtype=np.uint8)
    cb = rng.randint(0, 256, (2, 16, 16), dtype=np.uint8)
    cr = rng.randint(0, 256, (2, 16, 16), dtype=np.uint8)

    def fancy_h(c):  # libjpeg h2v1_fancy_upsample
        c = c.astype(np.float64)
        cm1 = np.concatenate([c[..., :1], c[..., :-1]], -1)
        cp1 = np.concatenate([c[..., 1:], c[..., -1:]], -1)
        out = np.stack([(3 * c + cm1) / 4, (3 * c + cp1) / 4], -1)
        return out.reshape(*c.shape[:-1], c.shape[-1] * 2)

    cbu = fancy_h(cb) - 128.0
    cru = fancy_h(cr) - 128.0
    yf = y.astype(np.float64)
    want = np.clip(np.stack([yf + 1.402 * cru,
                             yf - 0.344136 * cbu - 0.714136 * cru,
                             yf + 1.772 * cbu], -1), 0, 255)
    got = np.asarray(jax.jit(yuv422_to_rgb)(y, cb, cr))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_yuv_planes_shape_dispatch():
    """420 planes route to the 4:2:0 graph; bad geometry raises."""
    import jax

    from hipt_abmil_atec23_tpu.ops.yuv import yuv420_to_rgb, yuv_planes_to_rgb

    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, (1, 8, 8), dtype=np.uint8)
    c = rng.randint(0, 256, (1, 4, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(yuv_planes_to_rgb)(y, c, c)),
        np.asarray(jax.jit(yuv420_to_rgb)(y, c, c)))
    with pytest.raises(ValueError, match="plane geometry"):
        yuv_planes_to_rgb(y, y[:, :, :3], y[:, :, :3])


def test_select_rung_respects_yuv_bytes_per_px():
    """4:2:2 planes cost 2.0 bytes/px on the wire, not the table's 1.5 —
    on a wire-bound link the predicted yuv cost must scale accordingly."""
    from hipt_abmil_atec23_tpu.engine.encode import select_rung

    px = 4096 * 4096
    _, c15 = select_rung(["yuv", "rgb"], 10.0, px)
    _, c20 = select_rung(["yuv", "rgb"], 10.0, px, yuv_bytes_per_px=2.0)
    assert c20["yuv"] == pytest.approx(c15["yuv"] * 2.0 / 1.5)
    assert c20["rgb"] == c15["rgb"]
    # still cheaper than RGB: the plane rung keeps winning on a slow wire
    assert c20["yuv"] < c20["rgb"]


@needs_openjpeg
def test_encode_stream_rides_plane_rung_on_j2k(tmp_path):
    """Stream e2e on a subsampled 33003 .svs: the pipeline auto-probes the
    layout, ships planes (h2d bytes prove it), and features match the RGB
    transfer path. Chroma is held constant so the plane rung's fancy
    upsample and the RGB path's nearest upsample agree exactly — the two
    rungs then differ only by fixed-point-vs-float color conversion."""
    from hipt_abmil_atec23_tpu.engine.encode import (build_encoder,
                                                     encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    rng = np.random.RandomState(21)
    W = H = 512
    y = rng.randint(0, 256, (H, W), dtype=np.uint8)
    cb = np.full((H, W // 2), 120, np.uint8)   # constant chroma
    cr = np.full((H, W // 2), 135, np.uint8)
    path = str(tmp_path / "stream.svs")
    _write_plane_svs(path, y, cb, cr, 2, 1)

    s = TiffSlide(path)
    assert s.yuv_layout(0) == (2, 1)
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=2,
                                      dtype="float32"))
    assert enc.apply_yuv is not None
    coords = np.array([[0, 0], [256, 0], [0, 256], [256, 256]])

    stats = {}
    outs = dict(encode_stream([("a", s, coords)], enc, stats=stats,
                              adaptive_rungs=False))
    want = dict(encode_stream([("a", s, coords)], enc,
                              transform=lambda x: x))  # forces RGB path
    # 4 patches x 256^2 x (1 + 2/2) bytes — planes, not 3-byte RGB
    assert stats["h2d_bytes"] == 4 * 256 * 256 * 2
    assert outs["a"].shape == want["a"].shape == (4, enc.feat_dim)
    np.testing.assert_allclose(outs["a"], want["a"], rtol=5e-2, atol=5e-2)
    assert np.abs(outs["a"]).max() > 0.01
    s.close()
