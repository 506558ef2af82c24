"""JPEG2000 (Aperio .svs) native decode tests.

Real TCGA holds a large share of Aperio slides whose tiles are raw JPEG2000
codestreams (TIFF compression 33003 YCbCr / 33005 RGB) — the reference reads
them through OpenSlide (reference: wsi_core/WholeSlideImage.py:31). The
native engine decodes them through a runtime-dlopen'd libopenjp2
(native/wsireader.cpp decode_tile_j2k), so J2K slides ride the batched
threaded reader instead of requiring the OpenSlide fallback. Fixtures are
hand-assembled tiled TIFFs whose tile payloads are Pillow-encoded lossless
J2K codestreams — so RGB reads must be bit-exact."""
import io
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide

PIL = pytest.importorskip("PIL.Image")


def _j2k_codestream(arr: np.ndarray) -> bytes:
    """Lossless raw J2K codestream (SOC marker, no JP2 box) for one tile."""
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, format="JPEG2000", irreversible=False,
                            no_jp2=True)
    return buf.getvalue()


def write_tiled_tiff_raw(path: str, comp_tag: int, w: int, h: int, tile: int,
                         payloads) -> None:
    """Hand-assemble a minimal single-level tiled classic-TIFF whose tile
    payloads are arbitrary raw bytes under an arbitrary compression tag —
    the Aperio .svs layout in miniature (row-major tile order)."""
    ntx = (w + tile - 1) // tile
    nty = (h + tile - 1) // tile
    assert len(payloads) == ntx * nty
    n = len(payloads)
    entries = []
    n_entries = 11
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    bits_off = data_off
    off_arr = bits_off + 6 + 2  # BitsPerSample (3 SHORTs) + pad to 4
    cnt_arr = off_arr + 4 * n
    tile0 = cnt_arr + 4 * n
    offs, cnts, pos = [], [], tile0
    for p in payloads:
        offs.append(pos)
        cnts.append(len(p))
        pos += len(p)
    E = entries.append
    E((256, 3, 1, w))
    E((257, 3, 1, h))
    E((258, 3, 3, bits_off))
    E((259, 3, 1, comp_tag))
    E((262, 3, 1, 2))       # Photometric RGB
    E((277, 3, 1, 3))       # SamplesPerPixel
    E((284, 3, 1, 1))       # PlanarConfig contig
    E((322, 3, 1, tile))
    E((323, 3, 1, tile))
    if n == 1:
        E((324, 4, 1, offs[0]))
        E((325, 4, 1, cnts[0]))
    else:
        E((324, 4, n, off_arr))
        E((325, 4, n, cnt_arr))
    buf = struct.pack("<2sHI", b"II", 42, ifd_off)
    buf += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in sorted(entries):
        if typ == 3 and cnt == 1:
            buf += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += struct.pack("<HHII", tag, typ, cnt, val)
    buf += struct.pack("<I", 0)  # next IFD
    buf += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
    buf += b"".join(struct.pack("<I", o) for o in offs)
    buf += b"".join(struct.pack("<I", c) for c in cnts)
    buf += b"".join(bytes(p) for p in payloads)
    with open(path, "wb") as f:
        f.write(buf)


needs_openjpeg = pytest.mark.skipif(
    not native.get_lib().ws_j2k_available(),
    reason="libopenjp2 not resolvable at runtime")


@needs_openjpeg
def test_j2k_tags_supported_at_open():
    lib = native.get_lib()
    for tag in (33003, 33005, 34712):
        assert lib.ws_compression_supported(tag) == 1


@needs_openjpeg
def test_j2k_rgb_slide_reads_bit_exact(tmp_path):
    """33005 (Aperio J2K RGB), 2x2 tiles of lossless codestreams: full,
    cross-tile, boundary-padded and batched reads all bit-exact."""
    rng = np.random.RandomState(7)
    W = H = 512
    TILE = 256
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    tiles = [
        _j2k_codestream(img[ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE])
        for ty in range(2) for tx in range(2)
    ]
    path = str(tmp_path / "aperio_rgb.svs")
    write_tiled_tiff_raw(path, 33005, W, H, TILE, tiles)

    s = TiffSlide(path)  # must NOT raise UnsupportedCompressionError
    assert s.level_dimensions == [(W, H)]
    np.testing.assert_array_equal(s.read_region((0, 0), 0, (W, H)), img)
    # spans all four tiles
    np.testing.assert_array_equal(
        s.read_region((200, 200), 0, (200, 200)), img[200:400, 200:400])
    # off-edge read white-padded
    r = s.read_region((W - 50, H - 50), 0, (100, 100))
    exp = np.full((100, 100, 3), 255, np.uint8)
    exp[:50, :50] = img[H - 50:, W - 50:]
    np.testing.assert_array_equal(r, exp)
    # batched threaded path
    b = s.read_regions(np.array([[0, 0], [256, 256], [100, 30]]), 0, (64, 64))
    np.testing.assert_array_equal(b[0], img[:64, :64])
    np.testing.assert_array_equal(b[1], img[256:320, 256:320])
    np.testing.assert_array_equal(b[2], img[30:94, 100:164])
    s.close()


@needs_openjpeg
def test_j2k_ycbcr_slide_converts(tmp_path):
    """33003 (Aperio J2K YCbCr): codestream holds YCC samples; the native
    decode converts back to RGB within rounding of the forward transform."""
    rng = np.random.RandomState(11)
    rgb = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    a = rgb.astype(np.float64)
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    cb = 128 - 0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2]
    cr = 128 + 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2]
    ycc = np.clip(np.stack([y, cb, cr], -1).round(), 0, 255).astype(np.uint8)
    path = str(tmp_path / "aperio_ycc.svs")
    write_tiled_tiff_raw(path, 33003, 256, 256, 256, [_j2k_codestream(ycc)])

    s = TiffSlide(path)
    out = s.read_region((0, 0), 0, (256, 256))
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.max() <= 2  # fwd+inv YCC rounding only (J2K itself lossless)
    s.close()


@needs_openjpeg
def test_j2k_slide_takes_rgb_rung(tmp_path):
    """J2K tiles are not JPEG: the YUV-plane and sparse-DCT transfer rungs
    must both decline so the encode stream rides the RGB rung."""
    rng = np.random.RandomState(3)
    img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "aperio.svs")
    write_tiled_tiff_raw(path, 33005, 256, 256, 256, [_j2k_codestream(img)])
    s = TiffSlide(path)
    assert not s.supports_yuv420(0)
    lib = native.get_lib()
    import ctypes
    caps = (ctypes.c_int32 * 4)()
    assert lib.ws_dct_probe(s._h, 0, caps) == 0  # probe declines
    s.close()


@needs_openjpeg
def test_j2k_slide_encodes_identically_to_tiff(tmp_path):
    """Full encode stage on a J2K .svs: seg -> coords -> encode_slide must
    produce features IDENTICAL to the same image stored as a deflate TIFF
    (both paths lossless, so the J2K decode feeds the encoder the exact
    same pixels; replaces reference extract_features_fp.py on OpenSlide-
    read Aperio slides)."""
    from hipt_abmil_atec23_tpu.engine.encode import (build_encoder,
                                                     encode_slide)
    from hipt_abmil_atec23_tpu.slideio.patching import enumerate_coords
    from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue
    from hipt_abmil_atec23_tpu.slideio.synthetic import (
        make_tissue_image, write_synthetic_slide)
    from hipt_abmil_atec23_tpu.utils.config import (EncoderConfig,
                                                    SegConfig, TileConfig)

    img = make_tissue_image(1536, 1024, seed=9)
    TILE = 256
    tiles = []
    for ty in range(4):
        for tx in range(6):
            t = np.full((TILE, TILE, 3), 255, np.uint8)
            blk = img[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
            t[:blk.shape[0], :blk.shape[1]] = blk
            tiles.append(_j2k_codestream(t))
    j2k_path = str(tmp_path / "case.svs")
    write_tiled_tiff_raw(j2k_path, 33005, 1536, 1024, TILE, tiles)
    tif_path = str(tmp_path / "case.tif")
    write_synthetic_slide(tif_path, 1536, 1024, n_levels=1,
                          compression=native.COMPRESSION_DEFLATE, image=img)

    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=4,
                                      dtype="float32"))
    feats = {}
    for name, path in (("j2k", j2k_path), ("tif", tif_path)):
        s = TiffSlide(path)
        seg = segment_tissue(s, SegConfig(use_otsu=True, close=4, a_t=1))
        coords = enumerate_coords(s, seg, TileConfig(patch_size=256,
                                                     step_size=256))
        assert len(coords) > 0
        feats[name] = (coords, encode_slide(s, coords, enc))
        s.close()
    np.testing.assert_array_equal(feats["j2k"][0], feats["tif"][0])
    np.testing.assert_array_equal(feats["j2k"][1], feats["tif"][1])
    assert np.isfinite(feats["j2k"][1]).all()


def test_j2k_rejected_at_open_without_openjpeg(tmp_path):
    """With libopenjp2 disabled (WS_DISABLE_J2K knob), a J2K .svs must
    raise UnsupportedCompressionError AT OPEN, naming the codec and the
    libopenjp2 remedy — verified in a subprocess since the dlopen result
    is cached per process."""
    rng = np.random.RandomState(5)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "aperio_noj2k.svs")
    write_tiled_tiff_raw(path, 33005, 64, 64, 64, [_j2k_codestream(img)])
    code = (
        "from hipt_abmil_atec23_tpu.slideio import native\n"
        "from hipt_abmil_atec23_tpu.slideio.reader import (TiffSlide,\n"
        "    UnsupportedCompressionError)\n"
        "assert native.get_lib().ws_j2k_available() == 0\n"
        "try:\n"
        f"    TiffSlide({path!r})\n"
        "except UnsupportedCompressionError as e:\n"
        "    assert '33005' in str(e) and 'libopenjp2' in str(e), str(e)\n"
        "else:\n"
        "    raise AssertionError('opened without a J2K codec')\n"
        "print('OK')\n"
    )
    env = dict(os.environ, WS_DISABLE_J2K="1",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
