"""Benchmark driver. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric (BASELINE.json north star): end-to-end WSI throughput —
tile (segment + patch-coordinate enumeration) -> HIPT_4K hierarchical
features (ViT-256 -> ViT-4K, fused bf16 graph) -> ABMIL gated-attention
inference. Target: >= 50 TCGA-scale slides/hour/chip.

TCGA honesty: real 20x TCGA slides are multi-Gpx with tissue spanning
~40+ 4096^2 regions (HIPT's design target, reference: HIPT_4K/hipt_4k.py:
48-76). The bench fabricates 16384^2 JPEG-tiled pyramids with FULL tissue
coverage (16 regions each; decode cost is real libtiff JPEG on host
threads), measures regions/hour through the production path, and reports
the headline value normalized to 40-region slide equivalents so the
number extrapolates to real TCGA loads instead of flattering sparse
synthetic tissue. Raw slides/hour and regions/hour are in the extras.

Kernel-level modes (VERDICT r1 #8) re-measure the hot-kernel claims every
round with the same one-line schema:

    python bench.py --kernel vit256      # fused bf16 ViT-256 TFLOP/s
    python bench.py --kernel abmil_pool  # fused Pallas pool vs jnp, N=100k
    python bench.py --kernel flash       # Pallas flash attn vs XLA attn

vs_baseline: e2e = value / 50 (BASELINE.json; the reference publishes no
throughput numbers — SURVEY.md §6); kernel modes = speedup vs the jnp/XLA
baseline implementation (vit256: fraction of v5e bf16 peak, 197 TFLOP/s).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SLIDE_PX = 16384
N_SLIDES = 8  # median over more slides: one tunnel-link stall can't sink it
REGION = 4096
REGION_BATCH = 2
REGIONS_PER_TCGA_SLIDE = 40.0
TARGET_SLIDES_PER_HOUR = 50.0
V5E_BF16_PEAK_TFLOPS = 197.0


def _noise_block():
    """iid stain-colored noise, the JPEG worst case: every AC coefficient
    band carries energy, so the sparse-DCT pack is at its densest. Kept
    as the worst-case fixture (extras) after round 3's headline ran on it
    (VERDICT r3 #5: 'the bench slide is iid noise')."""
    rng = np.random.default_rng(0)
    return np.clip(
        np.array([199, 124, 180], np.int16)
        + rng.integers(-25, 25, size=(4096, 4096, 3), dtype=np.int16),
        0, 255).astype(np.uint8)


def _tissue_block():
    """H&E-like 4096px texture: power-law (fractal-octave) stroma density
    mapped white->eosin-pink, nuclei blobs in hematoxylin blue-purple,
    mild sensor noise. Matches what the DCT path exploits about real TCGA
    tiles — energy concentrated in low-frequency bands with sharp nuclei
    edges riding on top — without copying any real slide. (Reference
    anchor: read_region on real .svs JPEG tiles,
    wsi_core/WholeSlideImage.py:165.)"""
    import cv2
    rng = np.random.default_rng(1)
    size = 4096

    def octaves(base, n, decay):
        acc = np.zeros((size, size), np.float32)
        amp, res, tot = 1.0, base, 0.0
        for _ in range(n):
            g = rng.standard_normal((res, res)).astype(np.float32)
            acc += amp * cv2.resize(g, (size, size),
                                    interpolation=cv2.INTER_CUBIC)
            tot += amp
            amp *= decay
            res = min(res * 2, size)
        return acc / tot

    density = 1.0 / (1.0 + np.exp(-2.5 * octaves(8, 6, 0.6)))
    density = 0.45 + 0.55 * density  # tissue everywhere; no seg holes
    nuc = octaves(256, 3, 0.5)
    nuclei = (nuc > np.quantile(nuc, 0.88)).astype(np.float32)
    nuclei = cv2.GaussianBlur(nuclei, (0, 0), 1.2)
    eosin = np.array([225, 160, 200], np.float32)
    hema = np.array([90, 60, 150], np.float32)
    white = np.array([248, 246, 248], np.float32)
    img = (white * (1.0 - density[..., None])
           + eosin * density[..., None])
    img = img * (1.0 - nuclei[..., None]) + hema * nuclei[..., None]
    img += rng.normal(0.0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _fabricate_slide(path, block, write_synthetic_slide, native):
    """Tile one 4096px block to SLIDE_PX with a thin white border (Otsu
    needs a background mode) and write the YCbCr 4:2:0 JPEG pyramid."""
    full = np.tile(block, (SLIDE_PX // 4096, SLIDE_PX // 4096, 1))
    b = 192
    full[:b] = full[-b:] = 255
    full[:, :b] = 255
    full[:, -b:] = 255
    write_synthetic_slide(path + ".part", SLIDE_PX, SLIDE_PX, n_levels=5,
                          compression=native.COMPRESSION_JPEG,
                          image=full, ycbcr420=True)
    os.replace(path + ".part", path)


def _setup_cache(jax):
    # persistent compile cache: first bench run pays the (minutes-long)
    # tunnel compile; subsequent runs start hot
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _emit(payload):
    print(json.dumps(payload))


def _timed_device(fn, *args, iters=3):
    """Median wall time of fn(*args); each call FETCHES a result to host —
    through the axon tunnel block_until_ready alone under-reports
    (CLAUDE.md measured facts)."""
    import jax
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # host fetch = real barrier
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _chained_time(fn, params, x, chain=32, iters=5):
    """Per-call device time of fn(params, x) with `chain` in-graph
    iterations per dispatch: a single dispatch through the axon tunnel
    costs ~200ms+ regardless of compute, so kernel-scale timings MUST
    amortize it in-graph. Each iteration's input depends on the previous
    carry (x + 1e-30*c) so XLA cannot hoist the loop-invariant compute
    out of the scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(p, x):
        def body(c, _):
            out = fn(p, jax.tree.map(lambda a: a + (1e-30 * c).astype(a.dtype),
                                     x))
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(o).astype(jnp.float32) for o in leaves)
            return s * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              None, length=chain)
        return acc
    jax.block_until_ready(run(params, x))  # warm/compile
    return _timed_device(run, params, x, iters=iters) / chain


def _probe_wire_mbps(jax, nbytes=25_000_000, train=4):
    """Sustained H2D wire rate (MB/s): a TRAIN of `train` back-to-back
    synchronous puts, rate taken over the tail half. A single burst put
    rides buffers a sustained stream cannot (VERDICT r3: one 25 MB probe
    reported 21.9 MB/s, the 1.7 GB stream then sustained 6.2), so the
    tail of a 100 MB train is the rate the encode stream will actually
    see. Only meaningful AFTER the first jit execution: before it the
    runtime buffers puts and block_until_ready returns at an apparent
    ~1.4 GB/s while the wire drains asynchronously (link model in
    docs/PERFORMANCE.md §3)."""
    buf = np.zeros(nbytes, np.uint8)
    dev = jax.devices()[0]
    marks = [time.perf_counter()]
    for _ in range(train):
        d = jax.device_put(buf, dev)
        jax.block_until_ready(d)
        del d
        marks.append(time.perf_counter())
    tail = max(1, train // 2)
    dt = marks[-1] - marks[-1 - tail]
    return tail * nbytes / 1e6 / max(dt, 1e-9)


def _probe_wire_mbps_subproc(nbytes=25_000_000, timeout_s=420, train=4):
    """Sustained wire probe (same put-train as _probe_wire_mbps) in a
    SUBPROCESS with a hard timeout: a tunnel outage mid-gate would hang an
    in-process device_put forever (droop windows correlate with outages),
    and a bench that dies or hangs records NOTHING for the round. The
    child runs one tiny jit execution first so its puts are synchronous
    (the buffered-put rule, docs/PERFORMANCE.md §3); the tunneled backend
    accepts a second client while the parent holds the chip (verified:
    child init ~16s alongside a live parent). Returns 0.0 on
    failure/timeout — treated as 'link down, keep waiting'."""
    import subprocess
    import sys
    tail = max(1, train // 2)
    code = (
        "import time, numpy as np, jax\n"
        "x = jax.jit(lambda a: a + 1)(np.ones((8, 8), np.float32))\n"
        "np.asarray(x)\n"
        f"b = np.zeros({nbytes}, np.uint8)\n"
        "marks = [time.perf_counter()]\n"
        f"for _ in range({train}):\n"
        "    d = jax.device_put(b, jax.devices()[0])\n"
        "    jax.block_until_ready(d)\n"
        "    del d\n"
        "    marks.append(time.perf_counter())\n"
        f"dt = marks[-1] - marks[-1 - {tail}]\n"
        f"print({tail} * {nbytes} / 1e6 / max(dt, 1e-9))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if r.returncode == 0:
            return float(r.stdout.strip().splitlines()[-1])
    except Exception:
        pass
    return 0.0


def _wait_for_link(jax, min_mbps, max_wait_s, probe_every_s=90.0):
    """Bounded gate on tunnel-link weather, symmetric with
    _wait_for_backend: the dev tunnel's H2D rate droops to 2-8 MB/s for
    ~hour-long windows (measured), and the pipeline is wire-bound by ~16x —
    a capture inside such a window measures link luck, not the pipeline.
    Waits (bounded) for the wire to clear `min_mbps`, then proceeds
    regardless; the timed stream still reports whatever rate it really got
    (the effective_H2D_MBps extra attributes the result either way).

    The first probe is in-process (the warm stream just proved the backend
    alive); every probe taken while WAITING is subprocess-isolated with a
    timeout so a backend outage during the wait can't hang or kill the
    bench. Returns (last_probed_mbps, waited_s)."""
    import sys
    t0 = time.time()
    try:
        mbps = _probe_wire_mbps(jax)
    except Exception:
        mbps = 0.0
    while mbps < min_mbps and time.time() - t0 < max_wait_s:
        print(f"[bench] tunnel droop: wire {mbps:.1f} MB/s < {min_mbps:.0f}; "
              f"waiting ({time.time() - t0:.0f}/{max_wait_s:.0f}s)",
              file=sys.stderr)
        time.sleep(probe_every_s)
        mbps = _probe_wire_mbps_subproc()
    return mbps, time.time() - t0


def classify_droop(run_meas, gate_mbps, target_regions_s):
    """Droop classifier (pure; unit-tested in test_bench_regate.py —
    VERDICT r4 #1a): split per-slide measurements (interval_s, wire_bytes,
    regions) into (clean, droopy). A slide is droopy only when BOTH
    wire-starved (its observed per-slide wire rate fell below half the
    gated link rate — the link sank under it mid-stream) and below the
    target region rate — a slide that was slow for any other reason
    (decode stall, compute) is KEPT: re-measuring it would hide a real
    pipeline problem behind the link excuse."""
    clean, droopy = [], []
    for m in run_meas:
        dt_i, b_i, r_i = m
        starved = b_i / 1e6 / max(dt_i, 1e-9) < gate_mbps / 2.0
        below = r_i / max(dt_i, 1e-9) < target_regions_s
        (droopy if starved and below else clean).append(m)
    return clean, droopy


def measure_with_regate(run_stream, wait_for_link, n_slides, probed_mbps,
                        link_min_mbps, link_wait_s, target_regions_s,
                        max_attempts=2, regate_wait_s=600.0):
    """Measurement loop with a bounded mid-stream droop re-gate
    (VERDICT r3 #2, factored out of bench_e2e so the never-executed-on-a-
    good-link path is unit-testable — VERDICT r4 #1a). A droop onset
    inside the stream used to poison the whole median; wire-starved
    below-target slides are re-measured after a bounded link re-gate,
    with every waited second and every re-measured slide reported.

    ``run_stream(n, wire_hint)`` -> (t0, done_t, n_regions, byte_marks,
    stats); ``wait_for_link(min_mbps, max_wait_s)`` -> (mbps, waited_s).
    Injectable so tests drive it with synthetic streams.

    Returns a dict: ``meas`` — kept (interval_s, bytes, regions) per
    slide (droopy slides replaced by their re-measurement; kept honest
    once the re-gate budget is spent); ``all_meas`` — EVERY measured
    slide interval including droopy ones later re-measured (the
    unconditioned record — ADVICE r4: the headline median is good-link-
    conditional, readers get both); ``stats`` — accumulated stream
    stats; ``regate_attempts`` / ``regate_waited_s`` /
    ``droop_remeasured`` — bookkeeping; ``probed_mbps`` — last link
    probe."""
    meas, all_meas = [], []
    all_stats = {}
    regate_waited = 0.0
    regate_attempts = 0
    droop_remeasured = 0
    need = n_slides
    while need:
        t0, done_t, n_regions, byte_marks, stats = run_stream(
            need, probed_mbps or None)
        for k, v in stats.items():
            if k == "h2d_bytes" or k.startswith("regions_"):
                all_stats[k] = all_stats.get(k, 0) + v
            else:
                all_stats.setdefault(k, v)
        iv = np.diff([t0] + list(done_t))
        bts = np.diff([0] + list(byte_marks))
        run_meas = list(zip(iv.tolist(), bts.tolist(), list(n_regions)))
        all_meas.extend(run_meas)
        gate = max(probed_mbps, link_min_mbps)
        clean, droopy = classify_droop(run_meas, gate, target_regions_s)
        meas.extend(clean)
        if not droopy or regate_attempts >= max_attempts or link_wait_s <= 0:
            meas.extend(droopy)  # out of re-gate budget: keep them honest
            break
        regate_attempts += 1
        droop_remeasured += len(droopy)
        p_mbps, w = wait_for_link(link_min_mbps, regate_wait_s)
        regate_waited += w
        if p_mbps > 0:
            probed_mbps = p_mbps
        need = len(droopy)
    return {
        "meas": meas, "all_meas": all_meas, "stats": all_stats,
        "regate_attempts": regate_attempts,
        "regate_waited_s": regate_waited,
        "droop_remeasured": droop_remeasured,
        "probed_mbps": probed_mbps,
    }


def tcga40_rate(meas):
    """Median per-slide region rate of (interval_s, bytes, regions)
    measurements -> 40-region TCGA slide-equivalents/hour."""
    if not meas:
        return 0.0
    rates = np.array([m[2] for m in meas]) / np.array([m[0] for m in meas])
    return float(np.median(rates)) * 3600.0 / REGIONS_PER_TCGA_SLIDE


def bench_e2e(link_wait_s=2700.0, link_min_mbps=15.0):
    import jax
    import jax.numpy as jnp
    _setup_cache(jax)

    from hipt_abmil_atec23_tpu.engine.encode import (
        build_encoder, encode_stream)
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.slideio import native
    from hipt_abmil_atec23_tpu.slideio.patching import enumerate_coords
    from hipt_abmil_atec23_tpu.slideio.reader import TiffSlide
    from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue
    from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide
    from hipt_abmil_atec23_tpu.utils.config import (
        EncoderConfig, SegConfig, TileConfig)

    # ---- setup (untimed): fabricate FULL-tissue slides (all 16 regions
    # carry tissue, like the dense core of a TCGA section), build + warm.
    # v3+ stores TCGA-faithful YCbCr 4:2:0 JPEG tiles (real .svs files are
    # chroma-subsampled), enabling the raw-plane and sparse-DCT transfer
    # paths. TWO fixtures (VERDICT r3 #5): the HEADLINE runs on an
    # H&E-like texture (smooth fractal stroma + nuclei blobs — JPEG
    # statistics in the neighborhood of real tissue); the old iid-noise
    # fixture is kept as the JPEG WORST CASE and its pack size is
    # reported as an extra. Both deterministic — cached across runs.
    slide_path = f"/tmp/bench_slide_{SLIDE_PX}_tissue_v4.tif"
    noise_path = f"/tmp/bench_slide_{SLIDE_PX}_fulltissue_v3.tif"
    if not os.path.exists(slide_path):
        _fabricate_slide(slide_path, _tissue_block(),
                         write_synthetic_slide, native)
    if not os.path.exists(noise_path):
        _fabricate_slide(noise_path, _noise_block(),
                         write_synthetic_slide, native)

    # Link model (measured, round 3): before the first jit execution the
    # runtime BUFFERS device_put — block_until_ready returns at ~1.4 GB/s
    # but the wire drains asynchronously at the true tunnel rate
    # (25-55 MB/s healthy, 2-8 MB/s in droop windows; a D2H round-trip
    # after "fast" puts blocks for minutes). After the first execution
    # puts turn synchronous and report the honest wire rate. Staging
    # therefore buys NOTHING (total time is wire-bound either way) and
    # loses the decode/H2D/compute overlap — the overlapped stream is
    # the production path and the bench path.
    encoder = build_encoder(EncoderConfig(
        model_type="HIPT_4K", batch_size=REGION_BATCH, dtype="bfloat16"))
    mil = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):  # init is an execution — keep it off-chip
        mil_params = mil.init(jax.random.PRNGKey(0),
                              jnp.zeros((32, 192), jnp.float32), None)
    mil_params = jax.device_put(mil_params, jax.devices()[0])

    @jax.jit
    def mil_forward(params, bag, mask):
        out = mil.apply(params, bag, mask)
        return out.logits, out.a_raw

    # AOT-compile (no execution) the raw-YCbCr encoder entry + MIL forward
    warm_y = np.zeros((REGION_BATCH, REGION, REGION), np.uint8)
    warm_c = np.zeros((REGION_BATCH, REGION // 2, REGION // 2), np.uint8)
    encoder.compile_ahead((warm_y, warm_c, warm_c), yuv=True)
    N_PAD = 32  # max regions per bag (16 full regions + margin)
    _mil_compiled = mil_forward.lower(
        mil_params,
        jax.ShapeDtypeStruct((N_PAD, 192), jnp.float32),
        jax.ShapeDtypeStruct((N_PAD,), bool)).compile()

    tile_cfg = TileConfig(patch_size=REGION, step_size=REGION,
                          contour_fn="four_pt",
                          seg=SegConfig(use_otsu=True, close=4, a_t=1))

    def mil_step(feats):
        bag = np.zeros((N_PAD, 192), np.float32)
        mask = np.zeros((N_PAD,), bool)
        k = min(len(feats), N_PAD)
        bag[:k], mask[:k] = feats[:k], True
        logits, _ = _mil_compiled(mil_params, jax.device_put(bag),
                                  jax.device_put(mask))
        np.asarray(logits)  # host fetch: block_until_ready returns early
        # through the tunnel (CLAUDE.md) and would under-stamp done_t

    def run_stream(n_slides, wire_hint=None, pace_put_mbps=None):
        """tile -> HIPT encode -> ABMIL for `n_slides` slides through ONE
        continuous decode->H2D->compute pipeline (engine.encode.encode_stream
        — the production slide-stream path): the host link and the device
        never drain between slides. Returns per-slide completion times.
        ``wire_hint`` seeds the stream's rate-adaptive rung selector
        (MB/s) — the stream refines it from its own put timings.
        ``pace_put_mbps`` throttles the H2D stream (droop-floor subrun)."""
        t0 = time.perf_counter()
        slides, jobs = [], []
        for i in range(n_slides):
            slide = TiffSlide(slide_path)
            seg = segment_tissue(slide, tile_cfg.seg)
            coords = enumerate_coords(slide, seg, tile_cfg)
            slides.append(slide)
            jobs.append((f"s{i}", slide, coords))
        done_t, n_regions, byte_marks = [], [], []
        stats = {}
        for sid, feats in encode_stream(jobs, encoder, region_size=REGION,
                                        n_io_threads=16, prefetch=3,
                                        stats=stats, wire_mbps_hint=wire_hint,
                                        pace_put_mbps=pace_put_mbps):
            mil_step(feats)
            done_t.append(time.perf_counter())
            n_regions.append(len(feats))
            # shipped-bytes snapshot at each slide completion: attributes
            # wire bytes per slide (±the ~3-batch prefetch skew) for the
            # droop classifier below
            byte_marks.append(stats.get("h2d_bytes", 0))
        for s in slides:
            s.close()
        return t0, done_t, n_regions, byte_marks, stats

    run_stream(1, wire_hint=5.0)  # untimed warm slide: cold decoder
    # caches + the first execution flips the tunnel out of buffered-put
    # mode, so the timed stream below measures the honest synchronous
    # wire rate throughout. The hint pins the warm stream to the
    # byte-lightest rung so the sparse-DCT entry's compile lands here,
    # not in the timed section (the timed hint is the gate probe)

    # bounded link-weather gate (post-warm, so probes are synchronous)
    if link_wait_s > 0:
        probed_mbps, link_waited = _wait_for_link(jax, link_min_mbps,
                                                  link_wait_s)
    else:
        try:
            probed_mbps = _probe_wire_mbps(jax)
        except Exception:
            probed_mbps = 0.0
        link_waited = 0.0

    # ---- timed: the slide-stream production path. The dev tunnel's H2D
    # rate drifts ~2x within minutes, so the headline uses the MEDIAN
    # per-slide completion interval — robust to a single link stall — and
    # a mid-stream droop RE-GATE (VERDICT r3 #2): a droop onset inside the
    # stream used to poison the whole 8-slide median; now any slide that
    # is both wire-starved (below half the gated rate) and below the
    # target rate is re-measured after a bounded re-gate, with every
    # waited second and every remeasured slide reported in the extras.
    target_regions_s = (TARGET_SLIDES_PER_HOUR * REGIONS_PER_TCGA_SLIDE
                        / 3600.0)
    mr = measure_with_regate(
        run_stream, lambda m, w: _wait_for_link(jax, m, w), N_SLIDES,
        probed_mbps, link_min_mbps, link_wait_s, target_regions_s)
    meas = mr["meas"]
    stats = mr["stats"]
    probed_mbps = mr["probed_mbps"]
    regate_attempts = mr["regate_attempts"]
    regate_waited = mr["regate_waited_s"]
    droop_remeasured = mr["droop_remeasured"]
    intervals = np.array([m[0] for m in meas])
    regions_done = sum(m[2] for m in meas)
    dt = float(intervals.sum())
    rates = np.array([m[2] for m in meas]) / intervals
    median_rate = float(np.median(rates))
    per_slide_mbps = [round(b / 1e6 / max(t, 1e-9), 1)
                      for t, b, _ in meas]
    # unconditioned all-slides median (ADVICE r4): includes droopy
    # intervals the re-gate replaced — readers see both numbers
    all_slides_tcga40 = tcga40_rate(mr["all_meas"])

    # ---- droop-floor subrun (VERDICT r4 #1b): the ">=50/h at the droop
    # floor" claim, MEASURED instead of computed — a 2-slide stream with
    # the H2D transfer thread paced to an effective ~5 MB/s (the tunnel's
    # measured droop floor). Untimed extra: the pacing shim sleeps out
    # each put's byte budget, so the decode/H2D/compute overlap behaves
    # exactly as on a real slow wire and the rung selector sees ~5 MB/s.
    FLOOR_MBPS = 5.0
    t0f, done_tf, n_regf, byte_f, _ = run_stream(
        2, wire_hint=FLOOR_MBPS, pace_put_mbps=FLOOR_MBPS)
    ivf = np.diff([t0f] + done_tf)
    floor_meas = list(zip(ivf.tolist(), np.diff([0] + byte_f).tolist(),
                          n_regf))
    throttled_floor = tcga40_rate(floor_meas)
    throttled_wire_mbps = (sum(m[1] for m in floor_meas) / 1e6
                           / max(float(ivf.sum()), 1e-9))

    # link/compute decomposition: lets a reader attribute a low headline
    # to a tunnel droop window (wire MB/s) vs an actual pipeline problem.
    # h2d_bytes is the EXACT payload the stream shipped (sparse DCT packs
    # when the slide/grid allow: ~0.8 B/px on this slide; raw YCbCr 1.5;
    # RGB 3) — measured, not assumed.
    wire_bytes = sum(m[1] for m in meas)  # kept slides only — matches dt
    mb_per_region = wire_bytes / max(regions_done, 1) / 1e6
    eff_wire_mbps = wire_bytes / 1e6 / dt
    transfer_mode = {k: v for k, v in stats.items()
                     if k.startswith("regions_")}
    # per-region device latency (dispatch + compute + result fetch) in the
    # same degraded-dispatch mode the stream ran in: the serving-latency
    # number, and the compute-bound ceiling when the wire is not limiting.
    # Times the SAME entry the stream used (the sparse-DCT decode entry
    # when engaged — the on-device dequant+IDCT rides inside the forward).
    slide = TiffSlide(slide_path)
    seg = segment_tissue(slide, tile_cfg.seg)
    probe_coords = enumerate_coords(slide, seg, tile_cfg)[:REGION_BATCH]
    caps = stats.get("dct_caps")
    sample = None
    if caps:
        qt = slide.dct_probe(0)
        r = slide.read_regions_dct(probe_coords, 0, (REGION, REGION),
                                   cap_y_pb=caps[0], cap_c_pb=caps[1],
                                   cap_ge_y=caps[2], cap_ge_c=caps[3],
                                   cap_aesc_y=caps[4], cap_aesc_c=caps[5],
                                   cap_desc_y=caps[6], cap_desc_c=caps[7],
                                   cap_bm_y=caps[8], cap_bm_c=caps[9],
                                   n_threads=REGION_BATCH)
        if not r.status.any():
            from hipt_abmil_atec23_tpu.engine.encode import DctBatch
            sample = DctBatch(*r[:27], qt, r.valid, r.off)
            fn = encoder.compile_ahead(tuple(sample), dct=True)
    if sample is None:
        y = np.random.default_rng(0).integers(
            0, 255, (REGION_BATCH, REGION, REGION), np.uint8)
        c = np.zeros((REGION_BATCH, REGION // 2, REGION // 2), np.uint8)
        sample = (y, c, c)
        fn = encoder.compile_ahead(sample, yuv=True)
    slide.close()
    dy = jax.device_put(tuple(sample), jax.devices()[0])
    jax.block_until_ready(dy)
    np.asarray(fn(*dy))  # warm
    tcs = time.perf_counter()
    for _ in range(3):
        np.asarray(fn(*dy))
    compute_ms_region = (time.perf_counter() - tcs) / 3 / REGION_BATCH * 1e3

    # analytic encoder FLOPs per 4096px region -> the TFLOP/s implied by
    # the measured latency (256 ViT-256 images + one ViT-4K pass; same
    # FLOP model as bench_vit256). Puts the fused-kernel encode rate in
    # the driver-captured default output without a second kernel bench.
    def _tx_flops(l, d, depth, mlp=4):
        return depth * (2 * l * d * 3 * d + 2 * 2 * l * l * d
                        + 2 * l * d * d + 2 * 2 * l * d * mlp * d)
    flops_region = (256 * (_tx_flops(257, 384, 12)
                           + 2 * 256 * (16 * 16 * 3) * 384)
                    + _tx_flops(257, 192, 6) + 2 * 256 * 384 * 192)
    encode_tflops = flops_region / (compute_ms_region / 1e3) / 1e12

    # ---- heatmap stage from CACHED features (VERDICT r2 #9): attention
    # inference + rasterization only — the fine pass never re-encodes
    # (explain/driver.py reuses the feature bag; reference
    # create_heatmaps.py:379-381 recomputes through the encoder).
    from hipt_abmil_atec23_tpu.explain.heatmaps import draw_heatmap
    slide = TiffSlide(slide_path)
    seg = segment_tissue(slide, tile_cfg.seg)
    coords = enumerate_coords(slide, seg, tile_cfg)
    feats = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (len(coords), 192)), np.float32)
    t0h = time.perf_counter()
    bag = np.zeros((N_PAD, 192), np.float32)
    mask = np.zeros((N_PAD,), bool)
    k = min(len(feats), N_PAD)  # same clamp as mil_step above
    bag[:k], mask[:k] = feats[:k], True
    _, a_raw = _mil_compiled(mil_params, jax.device_put(bag),
                             jax.device_put(mask))
    scores = np.asarray(a_raw)[0, :k]
    hm = draw_heatmap(slide, coords[:k], scores, REGION,
                      patch_level=0, cmap="coolwarm", alpha=0.4)
    t_heat = time.perf_counter() - t0h
    assert hm.size > 0
    slide.close()

    # dual-fixture wire accounting (VERDICT r3 #5): exact sparse-DCT pack
    # size per 4096px region at each fixture's own stream caps (host-only
    # probe — the analytic pack size at probed caps is exact)
    def _dct_pack_mb(path):
        from hipt_abmil_atec23_tpu.engine.encode import probe_dct_caps
        s = TiffSlide(path)
        pts = np.array([[4096, 4096], [8192, 4096], [4096, 8192]])
        probed = probe_dct_caps(s, pts, 0, REGION)
        s.close()
        if probed is None:
            return None
        return round(probed[1] * REGION * REGION / 1e6, 2)

    fixture_mb = {"tissue": _dct_pack_mb(slide_path),
                  "noise_worstcase": _dct_pack_mb(noise_path)}

    # ---- train-stage extras (VERDICT r4 #6): the reference's primary
    # workflow (reference: utils/core_utils.py:102-297) measured on-chip
    # in the driver-captured record — fused-epoch optimizer steps/s at
    # the winning ATEC23 config (CLAM_SB hipt_smaller, 75-instance bags,
    # B=1) and a REAL vmapped 5-fold CV run (fold as a batch axis, the
    # fold_parallel execution model) wall time.
    from hipt_abmil_atec23_tpu.engine.train import build_step_fns
    from hipt_abmil_atec23_tpu.utils.config import (
        BagConfig, ExperimentConfig, ModelConfig, TaskConfig, TrainConfig)
    S, F, EPOCHS, n_pad_t, d_t = 160, 5, 20, 80, 192
    tcfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=75, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig(lr=1e-3, reg=1e-4, bag_loss="ce"))
    fns = build_step_fns(tcfg, np.array([80, 80]), n_pad_t, d_t)
    with jax.default_device(cpu):  # eager init off-chip (CLAUDE.md rule)
        p1 = fns.init_params(jax.random.PRNGKey(0))
        pf = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[fns.init_params(jax.random.PRNGKey(i))
                            for i in range(F)])
    dev = jax.devices()[0]
    p1 = jax.device_put(p1, dev)
    pf = jax.device_put(pf, dev)
    o1 = fns.tx.init(p1)
    of = jax.vmap(fns.tx.init)(pf)
    rng = np.random.default_rng(0)
    tf1 = jax.device_put(rng.normal(size=(S, 1, n_pad_t, d_t))
                         .astype(np.float32), dev)
    tm1 = jax.device_put(np.ones((S, 1, n_pad_t), bool), dev)
    tl1 = jax.device_put(rng.integers(0, 2, size=(S, 1)).astype(np.int32),
                         dev)
    tkey = jax.random.PRNGKey(1)
    jax.block_until_ready(fns.train_epoch(p1, o1, tf1, tm1, tl1, tkey))
    t_epoch = _timed_device(fns.train_epoch, p1, o1, tf1, tm1, tl1, tkey)
    # vmapped 5-fold CV: 20 epochs, fold axis on-device throughout — the
    # serial host loop carries state exactly as train_folds_parallel does
    vm_epoch = jax.jit(jax.vmap(fns.train_epoch))
    tff = jnp.broadcast_to(tf1, (F,) + tf1.shape)
    tmf = jnp.broadcast_to(tm1, (F,) + tm1.shape)
    tlf = jnp.broadcast_to(tl1, (F,) + tl1.shape)
    fkeys = jax.random.split(tkey, F)
    pw, ow = pf, of
    jax.block_until_ready(vm_epoch(pw, ow, tff, tmf, tlf, fkeys))  # compile
    t0t = time.perf_counter()
    pw, ow = pf, of
    for _ in range(EPOCHS):
        pw, ow, blf, _, _ = vm_epoch(pw, ow, tff, tmf, tlf, fkeys)
    np.asarray(blf)  # host fetch: the honest barrier (CLAUDE.md)
    cv_wall_s = time.perf_counter() - t0t

    regions_per_hour = median_rate * 3600.0
    raw_slides_per_hour = N_SLIDES / dt * 3600.0
    tcga40 = regions_per_hour / REGIONS_PER_TCGA_SLIDE
    _emit({
        "metric": "e2e_tcga_slides_per_hour_tile_hipt_abmil",
        "value": round(tcga40, 1),
        "unit": f"40-region TCGA-slide equivalents/hour "
                f"({regions_done // N_SLIDES} full-tissue 4096px regions "
                f"per measured 16k slide; median per-slide rate in a "
                f"{N_SLIDES}-slide stream)",
        "vs_baseline": round(tcga40 / TARGET_SLIDES_PER_HOUR, 2),
        "regions_per_hour": round(regions_per_hour, 1),
        "raw_slides_per_hour_16region": round(raw_slides_per_hour, 1),
        "per_slide_s": [round(t, 1) for t in intervals],
        "total_regions_per_hour": round(regions_done / dt * 3600.0, 1),
        "effective_H2D_MBps": round(eff_wire_mbps, 1),
        "wire_MB_per_region": round(mb_per_region, 1),
        "bench_fixture": "tissue_v4 (H&E-like fractal stroma + nuclei)",
        "dct_pack_MB_per_region_by_fixture": fixture_mb,
        "transfer_regions_by_mode": transfer_mode,
        "dct_value_caps": list(stats.get("dct_caps") or ()),
        "link_gate_probe_MBps": round(probed_mbps, 1),
        "link_gate_waited_s": round(link_waited, 1),
        "link_regate_attempts": regate_attempts,
        "link_regate_waited_s": round(regate_waited, 1),
        "droop_slides_remeasured": droop_remeasured,
        "all_slides_median_slide_equiv_per_hour": round(all_slides_tcga40, 1),
        "throttled_floor_slide_equiv_per_hour": round(throttled_floor, 1),
        "throttled_floor_wire_MBps": round(throttled_wire_mbps, 2),
        "per_slide_wire_MBps": per_slide_mbps,
        "rung_decisions": stats.get("rung_decisions", []),
        "rung_calibration": stats.get("rung_calibration"),
        "compute_ms_per_region_incl_dispatch": round(compute_ms_region, 1),
        "encode_tflops_implied_bf16": round(encode_tflops, 1),
        "compute_bound_ceiling_slides_per_hour": round(
            3600e3 / compute_ms_region / REGIONS_PER_TCGA_SLIDE, 1),
        "heatmap_ms_per_slide_cached_features": round(t_heat * 1e3, 1),
        "train_steps_per_sec_fused_epoch": round(S / t_epoch, 1),
        "train_epoch_ms_fused": round(t_epoch * 1e3, 1),
        "train_cv5_wall_s_20epochs": round(cv_wall_s, 2),
        "train_cv5_bags_per_sec": round(S * F * EPOCHS / cv_wall_s, 1),
        "note": "tunnel-H2D-bound (25-55MB/s honest wire rate; droop "
                "windows sink to 2-8); the sparse-DCT v3.1 path ships "
                "nibble/escape-packed quantized JPEG coefficients with "
                "prefix-packed AC bitmaps and group-budget spill to the "
                "explicit stream "
                "(~5.0-6.6MB/region vs 25 raw-YCbCr / 50 RGB) and the "
                "device dequantizes + IDCTs inside the encoder forward. "
                "Break-even for the 50/h target: ~2.8 MB/s wire at the "
                "5.05 MB tissue pack, ~3.7 MB/s at the 6.58 MB worst-case "
                "pack; the throttled_floor extra MEASURES the 5 MB/s "
                "droop-floor case (r5: 87.9/h). Decode/H2D/compute "
                "overlap across slide boundaries — local TPU hosts feed "
                "~100x faster",
    })


def bench_vit256():
    """Fused bf16 ViT-256 forward TFLOP/s (the HIPT inner loop), with the
    production whole-block fused kernel (ops/fused_block.py). In-graph
    lax.scan chaining amortizes the tunnel dispatch latency."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    _setup_cache(jax)
    from hipt_abmil_atec23_tpu.models.hipt import hipt_eval_normalize
    from hipt_abmil_atec23_tpu.models.vit import (
        VisionTransformer, VIT_CONFIGS)

    batch, chain = 512, 8
    on_tpu = jax.default_backend() == "tpu"
    model = VisionTransformer(dataclasses.replace(
        VIT_CONFIGS["vit_small"], dtype=jnp.bfloat16,
        use_fused_block=on_tpu))
    # init with a kernel-free twin (Pallas can't trace on the CPU device)
    init_model = VisionTransformer(dataclasses.replace(
        VIT_CONFIGS["vit_small"], dtype=jnp.bfloat16))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = init_model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 3), jnp.float32))
    variables = jax.device_put(variables, jax.devices()[0])

    # analytic FLOPs per image: 12 pre-norm blocks at L=257 tokens, D=384,
    # heads 6, mlp 4D — 2*flop per MAC
    L, D, depth = 257, 384, 12
    per_block = (2 * L * D * (3 * D)      # qkv
                 + 2 * 2 * L * L * D      # scores + AV
                 + 2 * L * D * D          # proj
                 + 2 * 2 * L * D * (4 * D))  # mlp fc1+fc2
    patchify = 2 * 256 * (16 * 16 * 3) * D  # one [256, 768]x[768, D] GEMM
    flops_per_img = depth * per_block + patchify

    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, 256, 256, 3), dtype=np.uint8))
    x_f = jax.device_put(hipt_eval_normalize(x))  # normalize once (host-cheap)
    dt = _chained_time(lambda v, xf: model.apply(v, xf), variables, x_f,
                       chain=chain)
    tflops = flops_per_img * batch / dt / 1e12
    _emit({
        "metric": "vit256_bf16_fused_tflops",
        "value": round(tflops, 1),
        "unit": f"TFLOP/s in-graph (batch {batch}, chain {chain}, "
                f"analytic transformer FLOPs)",
        "vs_baseline": round(tflops / V5E_BF16_PEAK_TFLOPS, 2),
        "images_per_sec": round(batch / dt, 1),
        # roofline decomposition (VERDICT r4 #5), measured r5 via the
        # single-block variant sweep at the production shape (512x264x384
        # bf16, g=4; relative ms/block — harness overhead cancels in the
        # ratios): removing each stage from the full kernel isolates its
        # cost. The GEMM-only skeleton is the shape's ceiling — LN,
        # softmax and the exact-erf GELU are required math, so ~80/63.7
        # of the kernel's rate (~+26%) is the maximum any further VPU
        # tuning could recover; the fused-qkv single-GEMM (adopted, bit-
        # identical) banked 6% of it.
        "roofline_ms_per_block_r5_sweep": {
            "full_perhead_qkv": 8.13, "full_fused_qkv": 7.64,
            "no_softmax": 8.00, "no_layernorm": 7.90, "no_gelu": 7.39,
            "gemm_only_skeleton": 6.47},
    })


def bench_abmil_pool():
    """Gated-attention ABMIL pooling: fused Pallas kernel vs the jnp (XLA)
    path at N in {10k, 100k}, plus the production auto-dispatch
    (ops/gated_attention_pool.py apply_pooled) which must pick the
    measured-faster path per size (VERDICT r2 #2 done-criterion)."""
    import jax
    import jax.numpy as jnp
    _setup_cache(jax)
    from hipt_abmil_atec23_tpu.models import build_mil_model
    from hipt_abmil_atec23_tpu.ops import gated_attention_pool as gap

    d = 192
    rng = np.random.default_rng(0)
    model = build_mil_model("clam_sb", size_arg="hipt_smaller", n_classes=2)
    small = jnp.zeros((8, d), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), small, None)
    p = gap.params_from_clam(params)

    extras, t_prod_100k, worst = {}, None, 1e9
    for n in (10_000, 100_000):
        bag = jax.device_put(jnp.asarray(
            rng.normal(size=(n, d)).astype(np.float32)))
        mask = jnp.ones((n,), bool)
        out_f = jax.block_until_ready(gap.gated_attention_pool(
            bag, p, mask=mask))
        out_d = jax.block_until_ready(gap.gated_attention_pool(
            bag, p, mask=mask, impl="dma"))
        out_j = jax.block_until_ready(jax.jit(
            gap.gated_attention_pool_reference)(bag, mask, p))
        # sanity only (strict parity lives in tests/test_gated_pool_kernel
        # .py); the jnp path's default-precision matmuls run bf16 passes on
        # TPU while the kernel accumulates f32. The DMA variant's real
        # async-copy pipeline only exists on hardware (interpret mode can't
        # catch ring races), so its parity IS asserted here, kernel-vs-
        # kernel at tight tolerance.
        np.testing.assert_allclose(np.asarray(out_f[0])[0],
                                   np.asarray(out_j[0]),
                                   rtol=5e-2, atol=5e-3)
        # logits tolerance: the two kernels chunk the online-softmax sum
        # differently (grid 2048-tiles vs DMA ring ~896-tiles), so f32
        # reassociation drifts ~n_chunks*eps — 1e-4 is tight for identical
        # math, loose enough not to abort the bench on reassociation noise
        np.testing.assert_allclose(np.asarray(out_d[0]), np.asarray(out_f[0]),
                                   rtol=1e-4, atol=1e-5)
        # scores are per-row (tiling-independent): keep tight
        np.testing.assert_allclose(np.asarray(out_d[1]), np.asarray(out_f[1]),
                                   rtol=1e-5, atol=1e-6)
        t_f = _chained_time(lambda _, b: gap.gated_attention_pool(
            b, p, mask=mask), None, bag)
        t_d = _chained_time(lambda _, b: gap.gated_attention_pool(
            b, p, mask=mask, impl="dma"), None, bag)
        t_j = _chained_time(lambda _, b: gap.gated_attention_pool_reference(
            b, mask, p), None, bag)
        t_prod = _chained_time(lambda _, b: gap.apply_pooled(
            model, params, b, mask).logits, None, bag)
        extras[f"fused_ms_{n//1000}k"] = round(t_f * 1e3, 3)
        extras[f"fused_dma_ms_{n//1000}k"] = round(t_d * 1e3, 3)
        extras[f"jnp_ms_{n//1000}k"] = round(t_j * 1e3, 3)
        extras[f"dispatched_ms_{n//1000}k"] = round(t_prod * 1e3, 3)
        # dispatch quality: production path vs best-of-both (>= ~1.0 means
        # the auto-dispatch picked the measured-faster implementation;
        # sub-ms timings on the dev tunnel carry ~15% jitter)
        worst = min(worst, min(t_f, t_j) / t_prod)
        if n == 100_000:
            t_prod_100k = t_prod
    _emit({
        "metric": "abmil_pool_dispatched_bags_per_sec",
        "value": round(1.0 / t_prod_100k, 1),
        "unit": "full 100k-instance bags/sec (production apply_pooled "
                "auto-dispatch, hipt_smaller)",
        "vs_baseline": round(worst, 2),
        **extras,
    })


def bench_train():
    """MIL training throughput at the winning ATEC23 config (CLAM_SB
    hipt_smaller, 75-instance bags, B=1 reference-faithful): one scan-fused
    epoch per dispatch (engine/train.py train_epoch) and E epochs per
    dispatch (train_epochs_chunk), vs the reference's execution model of
    ONE dispatch + loss fetch PER BAG (core_utils.py:300-442 calls
    loss.item() every batch), emulated here with the same jitted step at
    S=1. The gap is dispatch latency, which the tunnel makes explicit."""
    import jax
    import jax.numpy as jnp
    _setup_cache(jax)
    from hipt_abmil_atec23_tpu.engine.train import build_step_fns
    from hipt_abmil_atec23_tpu.utils.config import (
        ExperimentConfig, BagConfig, ModelConfig, TaskConfig, TrainConfig)

    S, V, E, n_pad, d = 160, 16, 4, 80, 192  # ~one ATEC23 CV-fold epoch
    cfg = ExperimentConfig(
        task=TaskConfig(n_classes=2, label_dict={"0": 0, "1": 1}),
        bags=BagConfig(max_patches_per_slide=75, batch_size=1),
        model=ModelConfig(model_type="clam_sb", model_size="hipt_smaller"),
        train=TrainConfig(lr=1e-3, reg=1e-4, bag_loss="ce"))
    fns = build_step_fns(cfg, np.array([80, 80]), n_pad, d)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):  # eager init off-chip (CLAUDE.md rule)
        params = fns.init_params(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    opt_state = fns.tx.init(params)

    rng = np.random.default_rng(0)
    feats = jax.device_put(rng.normal(size=(S, 1, n_pad, d))
                           .astype(np.float32), dev)
    mask = jax.device_put(np.ones((S, 1, n_pad), bool), dev)
    labels = jax.device_put(rng.integers(0, 2, size=(S, 1))
                            .astype(np.int32), dev)
    key = jax.random.PRNGKey(1)

    # one fused epoch per dispatch
    out = fns.train_epoch(params, opt_state, feats, mask, labels, key)
    jax.block_until_ready(out)  # warm/compile
    t_epoch = _timed_device(fns.train_epoch, params, opt_state, feats,
                            mask, labels, key)

    # reference execution model: one dispatch + host loss fetch per bag
    f1, m1, l1 = feats[:1], mask[:1], labels[:1]
    jax.block_until_ready(fns.train_epoch(params, opt_state, f1, m1, l1,
                                          key))  # S=1 compile
    p, o = params, opt_state
    t0 = time.perf_counter()
    for i in range(S):
        p, o, bl, _, _ = fns.train_epoch(p, o, f1, m1, l1, key)
        float(np.asarray(bl))  # the reference fetches loss.item() per bag
    t_perstep = time.perf_counter() - t0

    # E epochs per dispatch (with in-graph per-epoch validation)
    ef = jnp.broadcast_to(feats, (E,) + feats.shape)
    em = jnp.broadcast_to(mask, (E,) + mask.shape)
    el = jnp.broadcast_to(labels, (E,) + labels.shape)
    vf = jax.device_put(rng.normal(size=(E, V, n_pad, d))
                        .astype(np.float32), dev)
    vm = jax.device_put(np.ones((E, V, n_pad), bool), dev)
    vl = jax.device_put(rng.integers(0, 2, size=(E, V)).astype(np.int32),
                        dev)
    vv = jax.device_put(np.ones((E, V), np.float32), dev)
    outc = fns.train_epochs_chunk(params, opt_state, ef, em, el,
                                  vf, vm, vl, vv, key)
    jax.block_until_ready(outc)
    t_chunk = _timed_device(fns.train_epochs_chunk, params, opt_state,
                            ef, em, el, vf, vm, vl, vv, key) / E

    _emit({
        "metric": "mil_train_bags_per_sec_fused_epoch",
        "value": round(S / t_epoch, 1),
        "unit": f"optimizer steps/sec (CLAM_SB hipt_smaller, {S} bags of "
                f"{n_pad}x{d} per epoch, B=1, one lax.scan dispatch)",
        "vs_baseline": round(t_perstep / t_epoch, 2),
        "per_bag_dispatch_bags_per_sec": round(S / t_perstep, 1),
        "epoch_ms_fused": round(t_epoch * 1e3, 1),
        "epoch_ms_per_bag_dispatch": round(t_perstep * 1e3, 1),
        "epoch_ms_chunked_incl_val": round(t_chunk * 1e3, 1),
        "note": "vs_baseline = speedup over the reference's one-dispatch-"
                "per-bag execution model (loss.item() each batch) run with "
                "the SAME jitted step on the same chip",
    })


def bench_flash():
    """Long-sequence attention: the production dispatcher (q-tiled
    resident-K/V single pass, ops/flash_attention.py attention()) vs naive
    XLA and vs the online-softmax flash path, across the crossover sweep
    N in {4k, 16k, 32k} (VERDICT r2 #8). Equal total work per row (bh
    scales down with N)."""
    import jax
    import jax.numpy as jnp
    _setup_cache(jax)
    from hipt_abmil_atec23_tpu.ops.flash_attention import (
        attention, flash_attention)

    dh = 64
    rng = np.random.default_rng(0)
    scale = dh ** -0.5

    @jax.jit
    def naive(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        return jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, axis=-1), v)

    extras = {}
    head = None
    for bh, n in ((24, 4096), (6, 16384), (3, 32768)):
        q, k, v = (jnp.asarray(
            rng.normal(size=(bh, n, dh)).astype(np.float32))
            for _ in range(3))
        t_d = _chained_time(lambda _, x: attention(*x), None, (q, k, v),
                            chain=8)
        extras[f"dispatched_ms_{n}"] = round(t_d * 1e3, 2)
        if bh * n * n * 4 <= 8e9:  # XLA must materialize [bh, N, N] f32
            out_d = jax.block_until_ready(jax.jit(attention)(q, k, v))
            out_n = jax.block_until_ready(naive(q, k, v))
            np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_n),
                                       rtol=2e-2, atol=2e-3)
            t_n = _chained_time(lambda _, x: naive(*x), None, (q, k, v),
                                chain=8)
            extras[f"xla_ms_{n}"] = round(t_n * 1e3, 2)
            extras[f"speedup_vs_xla_{n}"] = round(t_n / t_d, 2)
        else:
            t_fl = _chained_time(lambda _, x: flash_attention(*x), None,
                                 (q, k, v), chain=8)
            extras[f"xla_ms_{n}"] = "OOM (scores > HBM budget)"
            extras[f"flash_online_softmax_ms_{n}"] = round(t_fl * 1e3, 2)
        if n == 4096:
            head = t_d
    _emit({
        "metric": "attention_dispatched_calls_per_sec",
        "value": round(1.0 / head, 1),
        "unit": "[24,4096,64] attention calls/sec (production dispatch: "
                "q-tiled resident-K/V Pallas kernel)",
        "vs_baseline": extras.get("speedup_vs_xla_4096", 0.0),
        **extras,
    })


def _wait_for_backend(max_wait_s=10800, probe_timeout_s=300):
    """Block until the accelerator backend initializes, re-execing on
    transient failures. The dev tunnel's TPU goes UNAVAILABLE for stretches
    (measured: >1h outages); a bench run launched inside such a window
    would otherwise die on backend init instead of measuring anything.
    Each probe runs in a SUBPROCESS because a failed/hung in-process init
    poisons jax's backend cache for the life of the process."""
    import subprocess
    import sys
    t0 = time.time()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if r.returncode == 0:
                return
            err = (r.stderr or "").strip().splitlines()
            msg = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            msg = f"backend init hung > {probe_timeout_s}s"
        waited = time.time() - t0
        if waited > max_wait_s:
            raise RuntimeError(
                f"accelerator backend unavailable after {waited:.0f}s: {msg}")
        print(f"[bench] backend unavailable ({msg}); retrying "
              f"({waited:.0f}/{max_wait_s}s)", file=sys.stderr)
        time.sleep(60)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel",
                    choices=["vit256", "abmil_pool", "flash", "train"],
                    default=None)
    ap.add_argument("--backend_wait_s", type=float, default=10800,
                    help="max seconds to wait for the TPU backend before "
                         "failing (0 disables the probe). Default 3h: the "
                         "tunnel's outage windows run multiple hours, and a "
                         "bench that errors out records NOTHING for the "
                         "round — waiting is strictly better.")
    ap.add_argument("--link_wait_s", type=float, default=2700,
                    help="e2e only: max seconds to wait for the tunnel's "
                         "H2D wire rate to clear --link_min_mbps before the "
                         "timed stream (0 disables). The pipeline is "
                         "wire-bound ~16x, so a capture inside a droop "
                         "window (2-8 MB/s, ~hour-long) measures link "
                         "weather, not the pipeline; the gate is bounded "
                         "and the extras report the probe + wait either "
                         "way.")
    ap.add_argument("--link_min_mbps", type=float, default=15.0)
    args = ap.parse_args()
    if args.backend_wait_s > 0:
        _wait_for_backend(max_wait_s=args.backend_wait_s)
    if args.kernel == "vit256":
        bench_vit256()
    elif args.kernel == "abmil_pool":
        bench_abmil_pool()
    elif args.kernel == "flash":
        bench_flash()
    elif args.kernel == "train":
        bench_train()
    else:
        bench_e2e(link_wait_s=args.link_wait_s,
                  link_min_mbps=args.link_min_mbps)


if __name__ == "__main__":
    main()
