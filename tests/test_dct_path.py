"""Sparse DCT-coefficient transfer path (native ws_read_regions_dct +
ops/jpegdct.py device decode): the host ships quantized DCT coefficients
(~0.5-0.9 bytes/px) instead of decoded pixel planes (1.5 for raw YCbCr,
3 for RGB); the device dequantizes, IDCTs (batched 8x8 matmuls), upsamples
and color-converts.

Parity oracles: the raw-YCbCr reader (same libjpeg-decoded planes the
device must reproduce — float IDCT vs jpeg_idct_islow differs by at most
1 LSB) and libtiff's full RGB decode (same tolerance bands as
tests/test_yuv_path.py).
"""
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide


@pytest.fixture(scope="module")
def ycbcr_slide(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dct")
    path = str(tmp / "ycbcr.tif")
    img = write_synthetic_slide(path, 1024, 1024, n_levels=2, seed=3,
                                ycbcr420=True)
    slide = TiffSlide(path)
    yield slide, img
    slide.close()


def test_dct_probe(ycbcr_slide, tmp_path):
    slide, _ = ycbcr_slide
    qt = slide.dct_probe(0)
    assert qt is not None and qt.shape == (3, 64) and qt.dtype == np.uint16
    assert (qt >= 1).all()  # real quantization tables
    # plain RGB-JPEG slides do NOT support the coefficient path
    p = str(tmp_path / "rgb.tif")
    write_synthetic_slide(p, 512, 512, n_levels=1, seed=1)
    rgb = TiffSlide(p)
    assert rgb.dct_probe(0) is None
    rgb.close()


def test_dct_planes_match_libjpeg_planes(ycbcr_slide):
    """Device dequant+IDCT must reproduce libjpeg's decoded planes (the
    YUV reader's output) within 1 LSB — float vs islow integer IDCT."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_planes

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [256, 256], [512, 128], [768, 768]])
    want = slide.read_regions_yuv420(coords, 0, (256, 256))
    r = slide.read_regions_dct(coords, 0, (256, 256))
    assert (r.status == 0).all()
    assert r.y_dc8.shape == (4, 32, 32)
    assert r.y_bmc.shape == (4, 512)  # 4-bit prefix lengths, 1024 blocks
    assert r.y_bmb.shape[1] % 64 == 0  # 64 groups x capbm prefix bytes
    # the prefix pack must beat the dense 8 B/block bitmap on tissue:
    # cnts[..., 5] is the measured per-group max prefix bytes — the size
    # the probe's cap (and hence the wire) shrinks to. (This read used
    # the always-fits default cap_bm=8, which pads to the dense size.)
    assert r.cnts[:, 0, 5].max() < 8 * 16
    assert r.cb_dc8.shape == (4, 16, 16)
    assert r.y_dc8.dtype == np.int8 and r.y_aidx.dtype == np.int32
    qt = slide.dct_probe(0)
    got = jax.jit(dct_regions_to_planes)(
        *r[:27], qt, r.valid, r.off)
    for name, g, w in zip("y cb cr".split(), got, want):
        diff = np.abs(np.asarray(g).astype(np.int16) - w.astype(np.int16))
        assert diff.max() <= 1, (name, diff.max())
        assert diff.mean() < 0.05, (name, diff.mean())


def test_dct_rgb_matches_libtiff_decode(ycbcr_slide):
    """Full path to RGB: same tolerance bands as the YUV path tests."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_rgb

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [512, 128], [768, 768]])
    ref = slide.read_regions(coords, 0, (256, 256))
    r = slide.read_regions_dct(coords, 0, (256, 256))
    qt = slide.dct_probe(0)
    got = np.asarray(jax.jit(dct_regions_to_rgb)(
        *r[:27], qt, r.valid, r.off))
    diff = np.abs(got - ref.astype(np.float32))
    assert diff.mean() < 1.0, diff.mean()
    assert np.quantile(diff, 0.99) <= 4.0, np.quantile(diff, 0.99)


def test_dct_region_boundary_white(ycbcr_slide):
    """A region hanging off the slide edge renders white past the valid
    extents, exactly like the RGB/YUV readers' background fill."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_rgb

    slide, _ = ycbcr_slide
    coords = np.array([[896, 896]])
    ref = slide.read_regions(coords, 0, (256, 256))
    r = slide.read_regions_dct(coords, 0, (256, 256))
    assert (r.status == 0).all()
    assert tuple(r.valid[0]) == (128, 128)
    qt = slide.dct_probe(0)
    got = np.asarray(jax.jit(dct_regions_to_rgb)(
        *r[:27], qt, r.valid, r.off))
    assert np.all(got[0, 128:] == 255) and np.all(got[0, :, 128:] == 255)
    diff = np.abs(got - ref.astype(np.float32))
    assert diff.mean() < 1.0, diff.mean()


def test_dct_odd_and_overflow_flag_fallback(ycbcr_slide):
    slide, _ = ycbcr_slide
    # chroma is co-sited on 2x2 units: ODD coords must flag, not corrupt
    # (even-but-misaligned grids ride the offset mode instead)
    r = slide.read_regions_dct(np.array([[7, 0], [0, 0]]), 0, (256, 256))
    assert (r.status == 1).all()
    # a value cap far below the content's density must flag, not truncate
    r2 = slide.read_regions_dct(np.array([[0, 0]]), 0, (256, 256),
                                cap_y_pb=1, cap_c_pb=1)
    assert r2.status[0] == 1


def test_dct_offset_grid_matches_libtiff_decode(ycbcr_slide):
    """Even origins OFF the 16px MCU lattice (the common TCGA contour-bbox
    case): the reader packs the aligned window plus one MCU row/column and
    the device crops — same tolerance vs libtiff as the aligned path, and
    the pack advertises the padded geometry + offsets."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_rgb

    slide, _ = ycbcr_slide
    coords = np.array([[8, 24], [136, 6], [520, 394]])
    ref = slide.read_regions(coords, 0, (256, 256))
    r = slide.read_regions_dct(coords, 0, (256, 256))
    assert (r.status == 0).all()
    assert r.off.shape == (3, 2) and (r.off == coords % 16).all()
    assert r.y_dc8.shape == (3, 34, 34)  # (256+16)/8 padded block grid
    qt = slide.dct_probe(0)
    got = np.asarray(jax.jit(dct_regions_to_rgb)(
        *r[:27], qt, r.valid, r.off))
    assert got.shape == (3, 256, 256, 3)
    diff = np.abs(got - ref.astype(np.float32))
    assert diff.mean() < 1.0, diff.mean()
    assert np.quantile(diff, 0.99) <= 4.0, np.quantile(diff, 0.99)


def test_dct_offset_grid_boundary_white(ycbcr_slide):
    """Offset mode + slide-edge region: the white mask sits at the TRUE
    region's slide-edge crossing, not the aligned read window's."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_rgb

    slide, _ = ycbcr_slide
    coords = np.array([[904, 890]])  # true valid extents (120, 134)
    ref = slide.read_regions(coords, 0, (256, 256))
    r = slide.read_regions_dct(coords, 0, (256, 256))
    assert (r.status == 0).all()
    assert tuple(r.valid[0]) == (120, 134)
    qt = slide.dct_probe(0)
    got = np.asarray(jax.jit(dct_regions_to_rgb)(
        *r[:27], qt, r.valid, r.off))
    assert np.all(got[0, 134:] == 255) and np.all(got[0, :, 120:] == 255)
    diff = np.abs(got - ref.astype(np.float32))
    assert diff.mean() < 1.0, diff.mean()


def test_decode_batch_dct_and_fallback(ycbcr_slide):
    from hipt_abmil_atec23_tpu.engine.encode import DctBatch, _decode_batch

    slide, _ = ycbcr_slide
    qt = slide.dct_probe(0)
    ctx = (qt, (32, 12, 64, 16, 1024, 256, 1024, 256, 8, 8))
    out = _decode_batch(slide, np.array([[0, 0], [256, 256]]),
                        patch_level=0, size=256, bs=2, transform=None,
                        target_patch_size=0, n_io_threads=2, dct_ctx=ctx)
    assert isinstance(out, DctBatch)
    assert out.qt.shape == (3, 64) and out.valid.shape == (2, 2)
    # odd chunk: falls back to the pixel tuple, never a broken pack
    out2 = _decode_batch(slide, np.array([[7, 0]]), patch_level=0,
                         size=256, bs=1, transform=None,
                         target_patch_size=0, n_io_threads=1, dct_ctx=ctx,
                         use_yuv=True)
    assert not isinstance(out2, DctBatch)


def test_encode_stream_uses_dct_and_matches_rgb(ycbcr_slide):
    """The stream auto-detects the coefficient path, ships packs, and
    produces features matching the RGB transfer path."""
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    class CountingSlide:
        def __init__(self, s):
            self._s = s
            self.dct_calls = 0

        def __getattr__(self, k):
            return getattr(self._s, k)

        def read_regions_dct(self, *a, **kw):
            self.dct_calls += 1
            return self._s.read_regions_dct(*a, **kw)

    slide, _ = ycbcr_slide
    proxy = CountingSlide(slide)
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=2,
                                      dtype="float32"))
    assert enc.apply_dct is not None
    coords = np.array([[0, 0], [256, 0], [0, 256], [512, 512], [256, 768]])
    outs = dict(encode_stream([("a", proxy, coords)], enc))
    assert proxy.dct_calls > 0, "coefficient path not engaged"
    want = dict(encode_stream([("a", slide, coords)], enc,
                              transform=lambda x: x))  # forces RGB path
    assert outs["a"].shape == want["a"].shape == (5, enc.feat_dim)
    np.testing.assert_allclose(outs["a"], want["a"], rtol=5e-2, atol=5e-2)
    assert np.abs(outs["a"]).max() > 0.01


def test_encode_stream_dct_odd_slides_still_encode(ycbcr_slide):
    """ODD coords disable the coefficient path (and the raw-plane path)
    but the stream still yields correct features."""
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    slide, _ = ycbcr_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=2,
                                      dtype="float32"))
    coords = np.array([[7, 0], [255, 9], [1, 263]])  # odd origins
    outs = dict(encode_stream([("a", slide, coords)], enc))
    want = dict(encode_stream([("a", slide, coords)], enc,
                              transform=lambda x: x))
    np.testing.assert_allclose(outs["a"], want["a"], rtol=5e-2, atol=5e-2)


def test_dct_group_size_matches_native(ycbcr_slide):
    """ops/jpegdct._G must mirror the native packer's kDctGroup — the
    device derives padded-stream slots from it."""
    from hipt_abmil_atec23_tpu.ops.jpegdct import _G
    from hipt_abmil_atec23_tpu.slideio.reader import dct_group_size

    slide, _ = ycbcr_slide
    assert _G == dct_group_size(slide._lib)


def test_dct_escape_streams_and_pad_indices(ycbcr_slide):
    """The noise fixture exercises byte-tier AC escapes (|v| > 7) and
    DC-delta escapes; esc8 group-padded tail slots and idx = -1 pads must
    NOT leak into the decode (negative JAX indexing would wrap) —
    regression for the v2->v2.1 ports."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_planes

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [512, 512]])
    r = slide.read_regions_dct(coords, 0, (256, 256))
    assert (r.status == 0).all()
    assert r.cnts[:, :, 4].max() > 0, "no byte-tier AC escapes exercised"
    assert (r.y_didx == -1).any(), "no pad slots exercised"
    # poison (a) esc8 slots past each group's escape count (a correct
    # unpack reads only ranks the bitmap marks as escapes) and (b) the
    # explicit-index pad VALUE slots; the decode must stay bit-identical
    from hipt_abmil_atec23_tpu.ops.jpegdct import _G
    ng = -(-(32 * 32) // _G)
    capge = r.y_esc8.shape[-1] // ng
    e = r.y_esc8.reshape(len(coords), ng, capge).copy()
    for i in range(len(coords)):
        for g in range(ng):
            e[i, g, r.cnts[i, 0, 4]:] = 77  # never a real escape slot
    r2 = r._replace(
        y_esc8=e.reshape(r.y_esc8.shape),
        y_aval=np.where(r.y_aidx < 0, 999, r.y_aval).astype(np.int16),
        y_dval=np.where(r.y_didx < 0, 30000, r.y_dval).astype(np.int16))
    qt = slide.dct_probe(0)
    fn = jax.jit(dct_regions_to_planes)
    got = [np.asarray(a) for a in fn(*r[:27], qt, r.valid, r.off)]
    got2 = [np.asarray(a) for a in fn(*r2[:27], qt, r2.valid, r2.off)]
    for g, g2 in zip(got, got2):
        np.testing.assert_array_equal(g, g2)


def test_dct_huge_coefficients_int16_tier(tmp_path):
    """Max-contrast step edges push quantized low-frequency ACs beyond
    int8 (real tissue's nuclei edges do this at q80): such regions must
    ride the int16 explicit tier and still decode to libjpeg parity —
    never fall back or truncate."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_planes

    img = np.zeros((512, 512, 3), np.uint8)
    img[:, 256:] = 255          # hard vertical step mid-slide
    img[::9] = 255              # off-block-period horizontal lines
    p = str(tmp_path / "edges.tif")
    # quality 92: small quant divisors push step-edge ACs past int8
    # (q80 clamps everything to the byte tier even at max contrast)
    write_synthetic_slide(p, 512, 512, n_levels=1, image=img,
                          ycbcr420=True, quality=92)
    slide = TiffSlide(p)
    coords = np.array([[0, 0], [256, 256]])
    # explicit caps: this fixture is denser than any tissue (every block
    # carries full-contrast lines); default caps rightly reject it with
    # status=1 -> pixel-path fallback, which is its own test below
    r = slide.read_regions_dct(coords, 0, (256, 256), cap_y_pb=62,
                               cap_c_pb=62, cap_ge_y=992, cap_ge_c=992,
                               cap_aesc_y=65536, cap_aesc_c=16384)
    assert (r.status == 0).all()
    assert r.cnts[:, :, 1].sum() > 0, "no |v|>127 escapes exercised"
    assert (r.y_esc8 == -128).any(), "no int16 sentinel in esc8"
    want = slide.read_regions_yuv420(coords, 0, (256, 256))
    qt = slide.dct_probe(0)
    got = jax.jit(dct_regions_to_planes)(*r[:27], qt, r.valid, r.off)
    for name, g, w in zip("y cb cr".split(), got, want):
        diff = np.abs(np.asarray(g).astype(np.int16) - w.astype(np.int16))
        assert diff.max() <= 1, (name, diff.max())
    slide.close()


def test_dct_group_budget_spill_bit_exact(ycbcr_slide):
    """r5 pack: group-budget shortfalls (value slots / bitmap bytes /
    escape slots) SPILL the affected coefficients to the explicit aesc
    stream instead of forcing the pixel fallback — caps sized for the
    typical group, not the hottest (halves tissue packs). A pack under
    starving caps must decode BIT-IDENTICALLY to a no-spill max-cap pack
    (the explicit `.at[idx].set` scatter replaces the zeros)."""
    import jax
    from hipt_abmil_atec23_tpu.ops.jpegdct import dct_regions_to_rgb, _G

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [512, 256]])
    big = slide.read_regions_dct(coords, 0, (512, 512), cap_y_pb=63,
                                 cap_c_pb=63, cap_ge_y=63 * _G,
                                 cap_ge_c=63 * _G, cap_aesc_y=65536,
                                 cap_aesc_c=16384, cap_desc_y=16384,
                                 cap_desc_c=4096, cap_bm_y=8, cap_bm_c=8)
    # starve all three group budgets at once (plus chroma)
    tight = slide.read_regions_dct(coords, 0, (512, 512), cap_y_pb=4,
                                   cap_c_pb=2, cap_ge_y=4, cap_ge_c=2,
                                   cap_aesc_y=65536, cap_aesc_c=16384,
                                   cap_desc_y=16384, cap_desc_c=4096,
                                   cap_bm_y=2, cap_bm_c=1)
    assert (big.status == 0).all() and (tight.status == 0).all()
    assert (tight.cnts[:, :, 1] > big.cnts[:, :, 1]).any()  # spilled
    # demand stats are cap-independent (max-cap probes read true demand)
    np.testing.assert_array_equal(tight.cnts[:, :, 3:], big.cnts[:, :, 3:])
    qt = slide.dct_probe(0)
    f = jax.jit(dct_regions_to_rgb)
    a = np.asarray(f(*big[:27], qt, big.valid, big.off))
    b = np.asarray(f(*tight[:27], qt, tight.valid, tight.off))
    np.testing.assert_array_equal(a, b)
    # explicit-stream exhaustion is still a clean pixel-path fallback
    r = slide.read_regions_dct(coords, 0, (512, 512), cap_y_pb=4,
                               cap_c_pb=2, cap_ge_y=4, cap_ge_c=2,
                               cap_aesc_y=16, cap_aesc_c=16,
                               cap_bm_y=2, cap_bm_c=1)
    assert (r.status == 1).all()


def test_unpack_kernel_interpret_matches_spilled_pack(ycbcr_slide,
                                                      monkeypatch):
    """The Pallas unpack kernel must stay bit-identical to the XLA path on
    a SPILLED pack too (cleared bits / zero nibbles are within the format;
    the explicit scatter runs outside the kernel either way)."""
    import jax
    from hipt_abmil_atec23_tpu.ops import jpegdct as J

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [512, 128]])
    r = slide.read_regions_dct(coords, 0, (256, 256), cap_y_pb=4,
                               cap_c_pb=2, cap_ge_y=4, cap_ge_c=2,
                               cap_bm_y=2, cap_bm_c=1,
                               cap_aesc_y=65536, cap_aesc_c=16384)
    assert (r.status == 0).all() and (r.cnts[:, :, 1] > 0).any()
    qt = slide.dct_probe(0)
    pack = tuple(r[:27]) + (qt, r.valid, r.off)
    monkeypatch.setattr(J, "_FORCE_KERNEL", False)
    ref = [np.asarray(p) for p in jax.jit(J.dct_regions_to_planes)(*pack)]
    monkeypatch.setattr(J, "_FORCE_KERNEL", True)
    monkeypatch.setattr(J, "_KERNEL_INTERPRET", True)
    got = [np.asarray(p) for p in J.dct_regions_to_planes(*pack)]
    for name, a, b in zip(("Y", "Cb", "Cr"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_unpack_kernel_interpret_matches_xla_path(ycbcr_slide, monkeypatch):
    """The VMEM-resident Pallas unpack (TPU production path, r5) must
    produce BIT-IDENTICAL planes to the factorized-XLA path the CPU suite
    validates against libjpeg — run here in Pallas interpreter mode.
    (Hardware parity of the compiled kernel is asserted on-chip by the
    bench profile runs.)"""
    import jax
    from hipt_abmil_atec23_tpu.ops import jpegdct as J

    slide, _ = ycbcr_slide
    coords = np.array([[0, 0], [256, 256], [512, 128]])
    r = slide.read_regions_dct(coords, 0, (256, 256))
    assert (r.status == 0).all()
    qt = slide.dct_probe(0)
    pack = tuple(r[:27]) + (qt, r.valid, r.off)

    monkeypatch.setattr(J, "_FORCE_KERNEL", False)
    ref = [np.asarray(p) for p in jax.jit(J.dct_regions_to_planes)(*pack)]
    monkeypatch.setattr(J, "_FORCE_KERNEL", True)
    monkeypatch.setattr(J, "_KERNEL_INTERPRET", True)
    got = [np.asarray(p) for p in J.dct_regions_to_planes(*pack)]
    for name, a, b in zip(("Y", "Cb", "Cr"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)
