"""Rate-adaptive transfer-rung selection (VERDICT r3 #4): the stream must
pick the rung with the cheapest predicted pipeline cost at the measured
wire rate — raw planes on a fast local feed, sparse DCT on a slow wire —
instead of by capability alone. Reference analog: the implicit DataLoader
worker-scaling adaptivity (reference: utils/utils.py:64-98)."""
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.engine.encode import (
    RUNG_HOST_MS_PER_MPX, select_rung)

PX = 4096 * 4096
DCT_BPP = 0.5  # ~measured on the noise worst case at stream caps


def test_slow_wire_picks_dct():
    rung, costs = select_rung(["rgb", "yuv", "dct"], 5.0, PX,
                              dct_bytes_per_px=DCT_BPP)
    assert rung == "dct"
    # wire-bound everywhere at 5 MB/s: costs ordered by bytes
    assert costs["dct"] < costs["yuv"] < costs["rgb"]


def test_fast_link_picks_yuv():
    """At local-feed rates the DCT rung's host decode dominates and raw
    planes win (the r3 'flagship rung is the wrong choice' scenario)."""
    rung, costs = select_rung(["rgb", "yuv", "dct"], 1000.0, PX,
                              dct_bytes_per_px=DCT_BPP)
    assert rung == "yuv"
    assert costs["yuv"] < costs["dct"]


def test_rgb_only_when_feasible():
    rung, _ = select_rung(["rgb"], 5.0, PX)
    assert rung == "rgb"
    # and when dct bytes are unknown the rung is skipped, not guessed
    rung2, costs2 = select_rung(["rgb", "dct"], 5.0, PX,
                                dct_bytes_per_px=None)
    assert rung2 == "rgb" and "dct" not in costs2


def test_hysteresis_keeps_sitting_rung():
    """A marginal challenger must not flip the rung (each switch costs a
    compile for the new entry shape)."""
    # find a wire rate where yuv barely beats dct
    lo, hi = 5.0, 1000.0
    for _ in range(40):
        mid = (lo + hi) / 2
        r, _ = select_rung(["yuv", "dct"], mid, PX, dct_bytes_per_px=DCT_BPP)
        if r == "dct":
            lo = mid
        else:
            hi = mid
    just_fast = hi * 1.01
    r_fresh, costs = select_rung(["yuv", "dct"], just_fast, PX,
                                 dct_bytes_per_px=DCT_BPP)
    assert r_fresh == "yuv"
    r_sitting, _ = select_rung(["yuv", "dct"], just_fast, PX,
                               dct_bytes_per_px=DCT_BPP, current="dct")
    assert r_sitting == "dct", "marginal win must not evict the sitting rung"
    # a decisive win does evict it
    r_decisive, _ = select_rung(["yuv", "dct"], 1e6, PX,
                                dct_bytes_per_px=DCT_BPP, current="dct")
    assert r_decisive == "yuv"


def test_rgb_never_wins_against_planes():
    """RGB ships 2x yuv's bytes AND pays the full host decode — it must
    only ever be the forced rung (transforms/odd coords), never chosen."""
    for mbps in (2.0, 20.0, 200.0, 2000.0):
        rung, _ = select_rung(["rgb", "yuv"], mbps, PX)
        assert rung == "yuv", mbps


@pytest.fixture(scope="module")
def ycbcr_slide(tmp_path_factory):
    from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide

    tmp = tmp_path_factory.mktemp("rung")
    path = str(tmp / "ycbcr.tif")
    write_synthetic_slide(path, 1024, 1024, n_levels=2, seed=3,
                          ycbcr420=True)
    slide = TiffSlide(path)
    yield slide
    slide.close()


def _stream_stats(slide, hint, coords=None):
    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    enc = build_encoder(EncoderConfig(model_type="resnet18", batch_size=2,
                                      dtype="float32"))
    if coords is None:
        coords = np.array([[0, 0], [256, 0], [0, 256], [512, 512],
                           [256, 768], [768, 256]])
    stats = {}
    outs = dict(encode_stream([("a", slide, coords)], enc, stats=stats,
                              wire_mbps_hint=hint))
    assert outs["a"].shape == (len(coords), enc.feat_dim)
    return stats


def test_calibrated_host_table_flips_static_choice():
    """VERDICT r4 #3 done-criterion (pure-function half): a measured-slow
    host decode must flip dct->yuv at a wire rate where the static
    dev-host prior table keeps dct."""
    from hipt_abmil_atec23_tpu.engine.encode import RUNG_DEV_MS_PER_MPX
    mbps = 30.0  # mid-rate link: static table picks dct here
    r_static, costs = select_rung(["yuv", "dct"], mbps, PX,
                                  dct_bytes_per_px=DCT_BPP)
    assert r_static == "dct", costs
    # a slower host (e.g. fewer cores) measured 6x the prior's dct decode
    calib = dict(RUNG_HOST_MS_PER_MPX)
    calib["dct"] = calib["dct"] * 6.0
    r_cal, costs_cal = select_rung(["yuv", "dct"], mbps, PX,
                                   dct_bytes_per_px=DCT_BPP,
                                   host_ms_mpx=calib,
                                   dev_ms_mpx=RUNG_DEV_MS_PER_MPX)
    assert r_cal == "yuv", costs_cal


def test_stream_calibrates_slow_dct_decode(ycbcr_slide, monkeypatch):
    """VERDICT r4 #3 done-criterion (stream half): a mocked slow dct host
    decode must raise the stream's calibrated host cost and flip the live
    selector dct->yuv, at a wire rate where the (mocked) static priors
    would keep dct forever."""
    from hipt_abmil_atec23_tpu.engine import encode as enc_mod

    # static priors that keep dct at ANY wire rate (host/dev free): only
    # the stream's own measurements can evict it
    monkeypatch.setattr(enc_mod, "RUNG_HOST_MS_PER_MPX",
                        {"dct": 0.0, "yuv": 0.0, "rgb": 0.0})
    monkeypatch.setattr(enc_mod, "RUNG_DEV_MS_PER_MPX",
                        {"dct": 0.0, "yuv": 0.0, "rgb": 0.0})
    real_decode = enc_mod._decode_batch

    def slow_dct_decode(slide, chunk, **kw):
        if kw.get("dct_ctx") is not None:
            import time
            time.sleep(0.25)  # ~1900 ms/Mpx at 2x256px — a very slow host
        return real_decode(slide, chunk, **kw)

    monkeypatch.setattr(enc_mod, "_decode_batch", slow_dct_decode)
    coords = np.array([[x, y] for y in (0, 256, 512, 768)
                       for x in (0, 256, 512)])  # 6 batches of 2
    stats = _stream_stats(ycbcr_slide, hint=1000.0, coords=coords)
    decisions = [d[1] for d in stats["rung_decisions"]]
    assert decisions[0] == "dct", stats["rung_decisions"]
    assert "yuv" in decisions, \
        f"calibration never evicted the slow rung: {stats['rung_decisions']}"
    calib = stats["rung_calibration"]["host_ms_mpx"]
    assert calib["dct"] > 100.0, calib  # the mocked slowness was measured


def test_wire_ewma_skips_buffered_puts(ycbcr_slide, monkeypatch):
    """ADVICE r4 medium: put timings taken before the process's first jit
    execution ON THE STREAM'S BACKEND are buffered (apparent ~GB/s while
    the wire drains async) and must never reach the wire EWMA. A
    one-batch stream's only put precedes its first execution, so the
    estimate must stay at the hint; once an execution has completed on
    that platform, later streams' puts do update it. An execution on a
    DIFFERENT platform must not open the gate (buffering is per backend
    client)."""
    from hipt_abmil_atec23_tpu.engine import encode as enc_mod

    monkeypatch.setattr(enc_mod, "_FIRST_EXEC_DONE", set())
    one = np.array([[0, 0], [256, 0]])  # exactly one batch at bs=2
    stats = _stream_stats(ycbcr_slide, hint=4.0, coords=one)
    assert stats["wire_mbps_final"] == 4.0, stats["wire_mbps_final"]
    # the first stream's execution marked this platform: now samples
    # count (CPU device_put reports far above the 4.0 hint)
    stats2 = _stream_stats(ycbcr_slide, hint=4.0, coords=one)
    assert stats2["wire_mbps_final"] > 4.0, stats2["wire_mbps_final"]
    # an execution recorded for ANOTHER backend keeps this one's gate
    # shut: a prior tpu run must not mark the cpu stream synchronous
    # (and vice versa on the production tunnel)
    monkeypatch.setattr(enc_mod, "_FIRST_EXEC_DONE", {"tpu"})
    stats3 = _stream_stats(ycbcr_slide, hint=4.0, coords=one)
    assert stats3["wire_mbps_final"] == 4.0, stats3["wire_mbps_final"]


def test_stream_respects_mocked_link(ycbcr_slide):
    """encode_stream end-to-end: a slow-wire hint keeps the DCT rung; a
    local-feed hint routes the same slide through raw planes (the first
    batch necessarily — later batches follow the measured EWMA, which on
    the CPU test backend is also local-feed fast)."""
    slow = _stream_stats(ycbcr_slide, hint=4.0)
    assert slow.get("regions_dct", 0) > 0
    assert slow["rung_decisions"][0][1] == "dct"
    fast = _stream_stats(ycbcr_slide, hint=5000.0)
    assert fast.get("regions_yuv", 0) > 0
    assert fast["rung_decisions"][0][1] == "yuv"
