"""Serving-stage tests: watch-folder drain, idempotent journal, outputs.

The reference has no serving story (batch scripts only); engine/serve.py
composes tile -> encode_stream -> MIL into a journaled service. These
tests drive it at the library boundary and through the CLI."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipt_abmil_atec23_tpu.engine.checkpoint import save_params
from hipt_abmil_atec23_tpu.engine.serve import (
    ServeConfig, ServeState, discover, load_journal, serve_forever,
    serve_once)
from hipt_abmil_atec23_tpu.models import build_mil_model
from hipt_abmil_atec23_tpu.slideio import native
from hipt_abmil_atec23_tpu.slideio.synthetic import write_synthetic_slide
from hipt_abmil_atec23_tpu.utils.config import (
    EncoderConfig, ModelConfig, SegConfig, TileConfig)


def _write_slide(path, seed):
    write_synthetic_slide(path, 2048, 1536, n_levels=3,
                          compression=native.COMPRESSION_DEFLATE, seed=seed)


@pytest.fixture(scope="module")
def serve_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    slide_dir = d / "slides"
    slide_dir.mkdir()
    _write_slide(str(slide_dir / "a.tif"), 1)
    _write_slide(str(slide_dir / "b.tif"), 2)

    # MIL checkpoint matching the resnet18 encoder's 512-d features
    model = build_mil_model("clam_sb", size_arg="tinier_resnet18",
                          n_classes=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((8, 512), jnp.float32), None)
    ckpt = str(d / "mil.msgpack")
    save_params(ckpt, params)

    cfg = ServeConfig(
        slide_dir=str(slide_dir), out_dir=str(d / "out"), ckpt_path=ckpt,
        encoder=EncoderConfig(model_type="resnet18", batch_size=8,
                              dtype="float32"),
        model=ModelConfig(model_type="clam_sb",
                          model_size="tinier_resnet18"),
        tile=TileConfig(patch_size=256, step_size=256,
                        seg=SegConfig(use_otsu=True, close=4, a_t=1)),
        n_classes=2, top_k=3,
        # tests write slides and drain immediately; the mid-upload
        # stability window is covered by its own discover()-level test
        min_stable_s=0.0)
    return d, slide_dir, cfg


def test_serve_once_drains_and_journals(serve_env):
    d, slide_dir, cfg = serve_env
    state = ServeState()
    recs = serve_once(cfg, state, verbose=False)
    done = {r["slide_id"] for r in recs if r["status"] == "done"}
    assert done == {"a", "b"}

    # per-slide outputs: JSON + blockmap with the reference h5 schema
    for sid in done:
        rec = json.load(open(os.path.join(cfg.out_dir, "results",
                                          f"{sid}.json")))
        assert rec["status"] == "done"
        assert len(rec["p"]) == 2 and abs(sum(rec["p"]) - 1) < 1e-4
        assert rec["n_regions"] > 0
        assert 1 <= len(rec["top_regions"]) <= cfg.top_k
        # top regions sorted by attention, coords inside the slide
        scores = [t[2] for t in rec["top_regions"]]
        assert scores == sorted(scores, reverse=True)
        assert all(0 <= t[0] < 2048 and 0 <= t[1] < 1536
                   for t in rec["top_regions"])
        import h5py
        with h5py.File(os.path.join(cfg.out_dir, "results",
                                    f"{sid}_blockmap.h5")) as f:
            assert f["attention_scores"].shape[0] == rec["n_regions"]

    # appended JSONL stream
    lines = open(os.path.join(cfg.out_dir, "predictions.jsonl")).readlines()
    assert {json.loads(l)["slide_id"] for l in lines} >= done

    # idempotence: nothing pending, second drain is a no-op
    assert discover(cfg) == []
    assert serve_once(cfg, state, verbose=False) == []


def test_serve_picks_up_new_slides_only(serve_env):
    d, slide_dir, cfg = serve_env
    _write_slide(str(slide_dir / "c.tif"), 3)
    assert discover(cfg) == ["c.tif"]
    recs = serve_once(cfg, ServeState(), verbose=False)
    assert [r["slide_id"] for r in recs] == ["c"]
    assert load_journal(cfg)["c"] == "done"


def test_serve_journals_unreadable_slide(serve_env):
    d, slide_dir, cfg = serve_env
    bad = slide_dir / "broken.tif"
    bad.write_bytes(b"not a tiff")
    recs = serve_once(cfg, ServeState(), verbose=False)
    assert recs == []  # error slides produce no prediction record
    assert load_journal(cfg)["broken"] == "error"
    # an errored slide stays pending (retry on next drain), done ones don't
    assert discover(cfg) == ["broken.tif"]
    os.remove(bad)


def test_serve_stream_failure_isolated_and_parked(serve_env, tmp_path,
                                                  monkeypatch):
    """A mid-stream failure must not kill the daemon AND must not park the
    healthy slides queued with the poison one: the drain falls back to
    per-slide streams, so only the slide that actually fails collects an
    'error' attempt and is eventually parked; its victims are served."""
    import dataclasses

    import hipt_abmil_atec23_tpu.engine.encode as enc
    d, slide_dir, cfg = serve_env
    cfg2 = dataclasses.replace(cfg, out_dir=str(tmp_path / "out3"),
                               poll_s=0.01, max_retries=3)

    real = enc.encode_stream

    def poison_b(jobs, *a, **k):
        # any stream containing slide 'b' dies before its first yield —
        # a deterministic poison slide among healthy ones
        if any(sid == "b" for sid, _, _ in jobs):
            raise RuntimeError("decode died on b")
        yield from real(jobs, *a, **k)

    monkeypatch.setattr(enc, "encode_stream", poison_b)
    recs = serve_once(cfg2, ServeState(), verbose=False)
    # the grouped stream failed, but the per-slide fallback served the
    # healthy slides — only 'b' is journaled 'error'
    done = sorted(r["slide_id"] for r in recs if r["status"] == "done")
    assert done == ["a", "c"]
    j = load_journal(cfg2)
    assert j["a"] == "done" and j["c"] == "done" and j["b"] == "error"
    assert discover(cfg2) == ["b.tif"]  # re-queued, not yet parked

    # repeated failing drains park ONLY the poison slide after max_retries
    served = serve_forever(cfg2, verbose=False, max_drains=3)
    assert served == 0
    assert discover(cfg2) == []  # parked: no crash-loop, no starvation
    j = load_journal(cfg2)
    assert j["b"] == "error" and j["a"] == "done" and j["c"] == "done"


def test_serve_forever_survives_drain_exception(serve_env, tmp_path,
                                                monkeypatch):
    """Even a failure outside the stream (journal/FS) must not end the
    daemon loop."""
    import dataclasses

    from hipt_abmil_atec23_tpu.engine import serve as srv
    d, slide_dir, cfg = serve_env
    cfg2 = dataclasses.replace(cfg, out_dir=str(tmp_path / "out4"),
                               poll_s=0.01)
    calls = []

    def boom(cfg, state, verbose=True):
        calls.append(1)
        raise OSError("disk full")

    monkeypatch.setattr(srv, "serve_once", boom)
    n = srv.serve_forever(cfg2, verbose=False, max_drains=3)
    assert n == 0 and len(calls) == 3


def test_serve_forever_bounded(serve_env, tmp_path):
    d, slide_dir, cfg = serve_env
    import dataclasses
    cfg2 = dataclasses.replace(cfg, out_dir=str(tmp_path / "out2"),
                               poll_s=0.01)
    n = serve_forever(cfg2, verbose=False, max_drains=2)
    assert n == 3  # a, b, c all pending against the fresh journal


def test_serve_cli_once(serve_env, tmp_path):
    from hipt_abmil_atec23_tpu.cli import main
    d, slide_dir, cfg = serve_env
    out = str(tmp_path / "cli_out")
    rc = main(["serve", "--slide_dir", str(slide_dir), "--out_dir", out,
               "--ckpt", cfg.ckpt_path, "--model_size", "tinier_resnet18",
               "--encoder", "resnet18", "--patch_size", "256",
               "--use_otsu", "--a_t", "1", "--float32", "--once",
               "--save_features", "--min_stable_s", "0"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "serve_config.json"))
    journal = {k: v for k, v in
               load_journal(ServeConfig(slide_dir=str(slide_dir),
                                        out_dir=out, ckpt_path="")).items()}
    assert journal.get("a") == "done"
    # --save_features persisted bags a later eval/heatmap stage can reuse
    from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore
    store = FeatureBagStore(os.path.join(out, "features"))
    feats, coords = store.load_with_coords("a")
    assert feats.shape[1] == 512 and len(coords) == feats.shape[0]


def test_discover_stability_window_and_replacement(serve_env, tmp_path):
    """Upload-safety rules of discover(): a file younger than min_stable_s
    is not eligible (mid-upload guard), and replacing a file (fresh mtime)
    invalidates its old journal rows — un-parking an errored slide and
    re-queuing a stale 'done'."""
    import dataclasses
    import time

    from hipt_abmil_atec23_tpu.engine.serve import _journal_append

    d, slide_dir, cfg = serve_env
    sdir = tmp_path / "stab"
    sdir.mkdir()
    path = str(sdir / "s.tif")
    _write_slide(path, 9)
    cfg2 = dataclasses.replace(cfg, slide_dir=str(sdir),
                               out_dir=str(tmp_path / "out_stab"),
                               min_stable_s=3600.0, max_retries=3)
    # fresh mtime: still being copied in, not eligible
    assert discover(cfg2) == []
    old = time.time() - 7200
    os.utime(path, (old, old))
    assert discover(cfg2) == ["s.tif"]  # stable now

    # park it: max_retries journaled errors (all newer than the old mtime)
    cfg3 = dataclasses.replace(cfg2, min_stable_s=0.0)
    for _ in range(cfg3.max_retries):
        _journal_append(cfg3, "s", "error", "corrupt upload")
    assert discover(cfg3) == []
    # replacing the file (mtime newer than the error rows) un-parks it
    time.sleep(0.01)
    new = time.time()
    os.utime(path, (new, new))
    assert discover(cfg3) == ["s.tif"]

    # same rule re-queues a replaced 'done' slide: new content, new score
    _journal_append(cfg3, "s", "done")
    assert discover(cfg3) == []
    time.sleep(0.01)
    new = time.time()
    os.utime(path, (new, new))
    assert discover(cfg3) == ["s.tif"]


def test_serve_duplicate_stem_not_cross_paired(serve_env, tmp_path,
                                               monkeypatch):
    """Two slide files sharing one stem (x.tif + x.svs) must not pair one
    slide's features with the other's coords: the first is served, the
    duplicate is skipped within the drain (slide identity IS the stem —
    journal and artifacts key on it)."""
    import dataclasses

    d, slide_dir, cfg = serve_env
    dup_dir = tmp_path / "dup_slides"
    dup_dir.mkdir()
    # same stem, different extensions AND different content/grid
    _write_slide(str(dup_dir / "x.tif"), 7)
    write_synthetic_slide(str(dup_dir / "x.svs"), 1024, 1024, n_levels=2,
                          compression=native.COMPRESSION_DEFLATE, seed=8)
    cfg2 = dataclasses.replace(cfg, slide_dir=str(dup_dir),
                               out_dir=str(tmp_path / "dup_out"))
    recs = serve_once(cfg2, ServeState(), verbose=False)
    done = [r for r in recs if r["status"] == "done"]
    assert len(done) == 1 and done[0]["slide_id"] == "x"
    # the served record's coords are consistent with ONE slide (no
    # cross-pairing): every top region lies inside that slide's bounds
    rec = done[0]
    w = 2048 if rec["n_regions"] > 16 else 1024
    assert all(0 <= t[0] < w and 0 <= t[1] < w + 512
               for t in rec["top_regions"])
    assert load_journal(cfg2)["x"] == "done"
    assert discover(cfg2) == []  # the stem is done; no crash-loop retries
