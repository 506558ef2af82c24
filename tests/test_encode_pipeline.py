"""Encode-stage tests: tile -> encoder -> feature bag, end-to-end on a
synthetic slide, plus transforms/Macenko."""
import os

import numpy as np
import pytest

from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore
from hipt_abmil_atec23_tpu.engine.encode import build_encoder, encode_slide, encode_and_store
from hipt_abmil_atec23_tpu.ops.augment import (
    build_transform, MacenkoNormalizer, TRANSFORM_PRESETS)
from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.patching import (
    enumerate_coords, save_coords_h5, coords_attrs)
from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide, make_tissue_image
from hipt_abmil_atec23_tpu.utils.config import EncoderConfig, SegConfig, TileConfig


@pytest.fixture(scope="module")
def tiled_slide(tmp_path_factory):
    d = tmp_path_factory.mktemp("enc")
    path = str(d / "s1.tif")
    write_synthetic_slide(path, 2048, 1536, n_levels=3,
                          compression=native.COMPRESSION_DEFLATE, seed=7)
    slide = TiffSlide(path)
    seg = segment_tissue(slide, SegConfig(use_otsu=True, close=4, a_t=1))
    cfg = TileConfig(patch_size=256, step_size=256)
    coords = enumerate_coords(slide, seg, cfg)
    h5 = str(d / "s1_coords.h5")
    save_coords_h5(h5, coords, coords_attrs(slide, cfg, "s1", str(d)))
    return path, h5, coords, slide


def test_encode_slide_resnet(tiled_slide):
    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet50", batch_size=8,
                                      dtype="float32"))
    feats = encode_slide(slide, coords, enc)
    assert feats.shape == (len(coords), 1024)
    assert np.isfinite(feats).all()
    # determinism: same input -> same features
    feats2 = encode_slide(slide, coords, enc)
    np.testing.assert_allclose(feats, feats2, atol=1e-5)


def test_encode_and_store_resume(tiled_slide, tmp_path):
    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=8,
                                      dtype="float32"))
    store = FeatureBagStore(str(tmp_path / "feats"))
    out = encode_and_store(path, h5, enc, store, "s1")
    assert out is not None and store.exists("s1")
    feats = store.load_features("s1")
    assert feats.shape == (len(coords), 512)
    f2, c2 = store.load_with_coords("s1")
    np.testing.assert_array_equal(c2, coords)
    # idempotent resume: second call skips
    assert encode_and_store(path, h5, enc, store, "s1") is None


def test_encode_hipt_small_region(tmp_path):
    """HIPT encoder over 512x512 regions (2x2 tiles) end to end."""
    img = make_tissue_image(1024, 1024, seed=2)
    path = str(tmp_path / "r.tif")
    native.write_pyramid(path, img, n_levels=2,
                         compression=native.COMPRESSION_DEFLATE)
    slide = TiffSlide(path)
    enc = build_encoder(EncoderConfig(model_type="HIPT_4K", batch_size=2,
                                      dtype="float32"))
    coords = np.array([[0, 0], [512, 0], [0, 512], [512, 512]], np.int64)
    feats = encode_slide(slide, coords, enc, region_size=512)
    assert feats.shape == (4, 192)
    assert np.isfinite(feats).all()
    slide.close()


def test_levit_texture_encoder():
    enc = build_encoder(EncoderConfig(model_type="levit_128s", batch_size=4,
                                      dtype="float32"))
    batch = np.random.default_rng(0).integers(
        0, 255, size=(4, 256, 256, 3)).astype(np.uint8)
    import jax.numpy as jnp
    out = np.asarray(enc.apply(jnp.asarray(batch)))
    assert out.shape == (4, 384)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("preset", [p for p in TRANSFORM_PRESETS
                                    if p != "macenko"])
def test_transform_presets_shapes(preset, rng):
    t = build_transform(preset, seed=1)
    batch = rng.integers(0, 255, size=(3, 64, 64, 3)).astype(np.uint8)
    if t is None:
        assert preset in ("none", "HIPT")
        return
    out = t(batch)
    assert out.shape == batch.shape and out.dtype == np.uint8


def test_macenko_normalizes_and_counts_failures():
    rng = np.random.default_rng(0)
    # H&E-like patch: two stain vectors mixed
    he = np.array([[0.65, 0.70, 0.29], [0.07, 0.99, 0.11]])
    conc = rng.uniform(0.05, 1.0, size=(64 * 64, 2))
    od = conc @ he
    img = np.clip(240 * np.exp(-od), 0, 255).astype(np.uint8).reshape(64, 64, 3)
    norm = MacenkoNormalizer()
    out = norm(np.stack([img, img]))
    assert out.shape == (2, 64, 64, 3) and norm.failures == 0
    # a constant white patch has no stained pixels -> failure passthrough
    white = np.full((1, 64, 64, 3), 255, np.uint8)
    out2 = norm(white)
    np.testing.assert_array_equal(out2, white)
    assert norm.failures == 1


def test_target_patch_size_resize(tiled_slide):
    """--target_patch_size: decoded patches resize before embedding."""
    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=8,
                                      dtype="float32"))
    feats = encode_slide(slide, coords[:8], enc, region_size=256,
                         target_patch_size=128)
    assert feats.shape == (min(8, len(coords)), 512)
    assert np.isfinite(feats).all()


def test_seg_preset_csv(tmp_path):
    import pandas as pd
    from hipt_abmil_atec23_tpu.utils.config import SegConfig, apply_seg_preset
    csv = tmp_path / "preset.csv"
    pd.DataFrame([{"sthresh": 15, "mthresh": 5, "close": 100,
                   "use_otsu": True, "a_t": 3, "unrelated_col": "x"}]).to_csv(
        csv, index=False)
    cfg = apply_seg_preset(SegConfig(), str(csv))
    assert cfg.sthresh == 15 and cfg.close == 100 and cfg.use_otsu
    assert cfg.a_t == 3 and cfg.a_h == 16  # untouched default
    named = apply_seg_preset(SegConfig(), "betterseg")
    assert named.use_otsu and named.close == 100
    import pytest as _pytest
    with _pytest.raises(KeyError):
        apply_seg_preset(SegConfig(), "nope")


def test_hipt_feature_variants(tmp_path):
    img = make_tissue_image(512, 512, seed=3)
    path = str(tmp_path / "v.tif")
    native.write_pyramid(path, img, n_levels=2,
                         compression=native.COMPRESSION_DEFLATE)
    slide = TiffSlide(path)
    coords = np.array([[0, 0]], np.int64)
    for variant, dim in (("mean256", 384), ("concat", 576)):
        enc = build_encoder(EncoderConfig(model_type="HIPT_4K", batch_size=1,
                                          dtype="float32",
                                          hipt_features=variant))
        feats = encode_slide(slide, coords, enc, region_size=512)
        assert feats.shape == (1, dim), (variant, feats.shape)
    slide.close()


def test_encode_slide_no_overlap_matches(tiled_slide):
    """overlap_dispatch=False (tunnel-link mode) produces identical features
    to the default double-buffered path."""
    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=4,
                                      dtype="float32"))
    a = encode_slide(slide, coords, enc, overlap_dispatch=True)
    b = encode_slide(slide, coords, enc, overlap_dispatch=False)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_encode_stream_staged_parity(tiled_slide):
    """stage=True (staged H2D: decode+transfer everything, AOT compile, then
    compute) yields identical features, order, and empty-job handling as the
    overlapped stream; a tiny budget forces multiple flushes."""
    from hipt_abmil_atec23_tpu.engine.encode import encode_stream

    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=4,
                                      dtype="float32"))
    jobs = [("a", slide, coords), ("empty", slide, coords[:0]),
            ("b", slide, coords[:5])]
    ref = dict(encode_stream(jobs, enc))
    got = dict(encode_stream(jobs, enc, stage=True))
    assert list(got) == ["a", "empty", "b"]
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-5)
    # budget-bounded flushes (every batch over the budget) match too
    got2 = dict(encode_stream(jobs, enc, stage=True, stage_budget_bytes=1))
    for k in ref:
        np.testing.assert_allclose(got2[k], ref[k], atol=1e-5)


def test_encode_many_pipelined(tiled_slide, tmp_path):
    """Slide-level pipelined encode: same artifacts as per-slide
    encode_and_store, skip-existing honored, writer errors surfaced."""
    from hipt_abmil_atec23_tpu.engine.encode import encode_many

    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=8,
                                      dtype="float32"))
    jobs = [(path, h5, "sA"), (path, h5, "sB"), (path, h5, "sC")]
    store = FeatureBagStore(str(tmp_path / "many"))
    done, failed = encode_many(jobs, enc, store, verbose=False)
    assert done == ["sA", "sB", "sC"] and failed == []
    ref_store = FeatureBagStore(str(tmp_path / "one"))
    from hipt_abmil_atec23_tpu.engine.encode import encode_and_store
    encode_and_store(path, h5, enc, ref_store, "sA")
    np.testing.assert_allclose(store.load_features("sA"),
                               ref_store.load_features("sA"), atol=1e-5)
    # coords land in the h5 artifact
    import h5py
    with h5py.File(store.h5_path("sB")) as f:
        assert f["coords"].shape == (len(coords), 2)
    # second run skips everything
    done2, failed2 = encode_many(jobs, enc, store, verbose=False)
    assert done2 == [] and failed2 == []


def test_encode_many_stream_failure_flushes_writes(tiled_slide, tmp_path,
                                                   monkeypatch):
    """A mid-stream failure must not drop already-queued feature writes
    (slides reported 'done' MUST be on disk), must close every slide
    handle, and must leave the stage resumable (regression: the error
    path skipped the writer sentinel/join and leaked open handles)."""
    import pytest

    import hipt_abmil_atec23_tpu.engine.encode as enc_mod
    from hipt_abmil_atec23_tpu.engine.encode import encode_many

    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=8,
                                      dtype="float32"))
    store = FeatureBagStore(str(tmp_path / "flush"))
    real = enc_mod.encode_stream

    def first_then_boom(jobs, *a, **k):
        it = real(jobs, *a, **k)
        try:
            yield next(it)
        finally:
            it.close()  # release the inner pipeline before raising
        raise RuntimeError("device fell over")

    monkeypatch.setattr(enc_mod, "encode_stream", first_then_boom)
    jobs = [(path, h5, "fA"), (path, h5, "fB")]
    with pytest.raises(RuntimeError):
        encode_many(jobs, enc, store, verbose=False)
    assert store.exists("fA")      # queued write flushed, not dropped
    assert not store.exists("fB")

    # handles were closed and the writer joined: the stage resumes clean
    monkeypatch.setattr(enc_mod, "encode_stream", real)
    done, failed = encode_many(jobs, enc, store, verbose=False)
    assert done == ["fB"] and failed == []
    assert store.exists("fB")


def test_encode_many_skips_unreadable_slide(tiled_slide, tmp_path):
    """One unreadable slide in a group must neither abort the stage nor
    leak the group's already-open handles (regression: a failing open in
    the group comprehension killed the whole run)."""
    from hipt_abmil_atec23_tpu.engine.encode import encode_many

    path, h5, coords, slide = tiled_slide
    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=8,
                                      dtype="float32"))
    missing = str(tmp_path / "nope.tif")
    jobs = [(path, h5, "g1"), (missing, h5, "bad"), (path, h5, "g2")]
    store = FeatureBagStore(str(tmp_path / "skip"))
    done, failed = encode_many(jobs, enc, store, verbose=False)
    assert done == ["g1", "g2"]
    assert [s for s, _ in failed] == ["bad"]  # machine-readable record
    assert store.exists("g1") and store.exists("g2")
    assert not store.exists("bad")
