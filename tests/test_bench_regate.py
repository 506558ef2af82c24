"""Droop classifier + re-gate bookkeeping (VERDICT r4 #1a): the bench's
mid-stream droop machinery had never executed anywhere (good-link captures
record regate_attempts=0) — these tests drive the factored-out pure loop
(bench.classify_droop / bench.measure_with_regate) with synthetic streams,
plus the H2D pacing shim the droop-floor subrun measures through.
Reference anchor: the decode stage this stream replaces,
extract_features_fp.py:144-171."""
import numpy as np

import bench

# 50 slide-equiv/h * 40 regions / 3600 s
TARGET_RS = bench.TARGET_SLIDES_PER_HOUR * bench.REGIONS_PER_TCGA_SLIDE / 3600.0

CLEAN = (4.0, 150e6, 16)       # 37.5 MB/s, 4 r/s: healthy
DROOPY = (60.0, 150e6, 16)     # 2.5 MB/s, 0.27 r/s: starved AND below
STARVED_FAST = (20.0, 150e6, 16)   # 7.5 MB/s but 0.8 r/s: kept (met target)
SLOW_FED = (60.0, 1.0e9, 16)   # 16.7 MB/s, 0.27 r/s: kept (not the link)


def test_classifier_flags_only_starved_and_below():
    clean, droopy = bench.classify_droop(
        [CLEAN, DROOPY, STARVED_FAST, SLOW_FED], gate_mbps=30.0,
        target_regions_s=TARGET_RS)
    assert droopy == [DROOPY]
    assert clean == [CLEAN, STARVED_FAST, SLOW_FED]


def _mk_stream(script):
    """Synthetic run_stream: `script[i]` is the list of per-slide
    (interval_s, wire_bytes, regions) the i-th call serves (truncated to
    the n it is asked for; the last entry repeats)."""
    calls = []

    def run_stream(n, hint):
        i = min(len(calls), len(script) - 1)
        calls.append((n, hint))
        run = script[i][:n]
        t, b = 0.0, 0
        done, regs, marks = [], [], []
        for dt, by, r in run:
            t += dt
            b += int(by)
            done.append(t)
            regs.append(r)
            marks.append(b)
        return 0.0, done, regs, marks, {"h2d_bytes": b, "regions_dct": sum(regs)}

    return run_stream, calls


def _wait_ok(min_mbps, max_wait_s):
    return 45.0, 120.0


def test_all_clean_no_regate():
    run, calls = _mk_stream([[CLEAN] * 8])
    r = bench.measure_with_regate(run, _wait_ok, 8, 30.0, 15.0, 2700.0,
                                  TARGET_RS)
    assert len(calls) == 1 and calls[0] == (8, 30.0)
    assert r["regate_attempts"] == 0
    assert r["regate_waited_s"] == 0.0
    assert r["droop_remeasured"] == 0
    assert r["meas"] == [CLEAN] * 8
    assert r["all_meas"] == r["meas"]
    assert r["probed_mbps"] == 30.0


def test_droopy_slide_is_regated_and_remeasured():
    run, calls = _mk_stream([[CLEAN, CLEAN, DROOPY, CLEAN], [CLEAN]])
    r = bench.measure_with_regate(run, _wait_ok, 4, 30.0, 15.0, 2700.0,
                                  TARGET_RS)
    assert [c[0] for c in calls] == [4, 1]
    assert calls[1][1] == 45.0, "re-run must seed the post-re-gate probe"
    assert r["regate_attempts"] == 1
    assert r["droop_remeasured"] == 1
    assert r["regate_waited_s"] == 120.0
    assert r["probed_mbps"] == 45.0
    # kept record: 3 clean + the re-measured slide; unconditioned record
    # additionally holds the droopy interval that was replaced
    assert sorted(r["meas"]) == sorted([CLEAN] * 4)
    assert sorted(r["all_meas"]) == sorted([CLEAN] * 4 + [DROOPY])
    # wire accounting: kept bytes match kept slides exactly
    assert sum(m[1] for m in r["meas"]) == 4 * CLEAN[1]
    # stats accumulate across the two runs
    assert r["stats"]["h2d_bytes"] == sum(m[1] for m in r["all_meas"])
    assert r["stats"]["regions_dct"] == sum(m[2] for m in r["all_meas"])


def test_persistent_droop_kept_honest_after_budget():
    run, calls = _mk_stream([[CLEAN, CLEAN, DROOPY], [DROOPY], [DROOPY]])
    r = bench.measure_with_regate(run, _wait_ok, 3, 30.0, 15.0, 2700.0,
                                  TARGET_RS, max_attempts=2)
    assert [c[0] for c in calls] == [3, 1, 1]
    assert r["regate_attempts"] == 2
    assert r["droop_remeasured"] == 2
    assert r["regate_waited_s"] == 240.0
    # out of budget: the final droopy interval stays in the kept record
    assert sorted(r["meas"]) == sorted([CLEAN, CLEAN, DROOPY])
    assert sorted(r["all_meas"]) == sorted([CLEAN, CLEAN] + [DROOPY] * 3)


def test_regate_disabled_keeps_droopy_immediately():
    run, calls = _mk_stream([[DROOPY] * 2])
    r = bench.measure_with_regate(run, _wait_ok, 2, 30.0, 15.0, 0.0,
                                  TARGET_RS)
    assert len(calls) == 1
    assert r["regate_attempts"] == 0
    assert r["meas"] == [DROOPY] * 2


def test_failed_probe_keeps_previous_gate():
    run, _ = _mk_stream([[DROOPY], [CLEAN]])

    def wait_dead(min_mbps, max_wait_s):
        return 0.0, 600.0  # link down through the whole re-gate window

    r = bench.measure_with_regate(run, wait_dead, 1, 30.0, 15.0, 2700.0,
                                  TARGET_RS)
    assert r["probed_mbps"] == 30.0  # a dead probe must not zero the gate
    assert r["regate_waited_s"] == 600.0


def test_tcga40_rate_median():
    # 16 regions in 4s = 4 r/s -> 14400 r/h -> 360 slide-equiv/h
    assert bench.tcga40_rate([CLEAN]) == 360.0
    # median over mixed rates, robust to the one slow slide
    assert bench.tcga40_rate([CLEAN, CLEAN, DROOPY]) == 360.0
    assert bench.tcga40_rate([]) == 0.0


def test_encode_stream_pacing_shim(tmp_path):
    """The droop-floor subrun's measurement shim: pace_put_mbps must
    actually throttle the stream's effective H2D rate (the sleep is real,
    so the droop-floor extra is a measurement, not arithmetic)."""
    import time

    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide
    from hipt_abmil_atec23_tpu.utils.config import EncoderConfig

    path = str(tmp_path / "pace.tif")
    write_synthetic_slide(path, 1024, 1024, n_levels=2, seed=3, ycbcr420=True)
    slide = TiffSlide(path)
    try:
        enc = build_encoder(EncoderConfig(model_type="resnet18",
                                          batch_size=2, dtype="float32"))
        coords = np.array([[0, 0], [256, 0], [0, 256], [512, 512]])
        pace = 0.5  # MB/s
        stats = {}
        t0 = time.perf_counter()
        out = dict(encode_stream([("a", slide, coords)], enc, stats=stats,
                                 wire_mbps_hint=pace, pace_put_mbps=pace))
        wall = time.perf_counter() - t0
        assert out["a"].shape == (4, enc.feat_dim)
        floor_s = stats["h2d_bytes"] / 1e6 / pace
        assert wall >= 0.7 * floor_s, (wall, floor_s, stats["h2d_bytes"])
    finally:
        slide.close()
