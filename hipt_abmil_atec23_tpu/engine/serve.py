"""Production serving stage: continuous slide-inference service.

The reference has no serving story — its pipeline is three batch scripts
run by hand (create_patches_fp.py -> extract_features_fp.py -> eval.py).
This stage composes the same tile -> encode -> MIL path into a
watch-folder service shaped for TPU deployment:

- slides that arrive together ride ONE encode_stream pipeline
  (engine/encode.py): decode, H2D and device compute overlap across
  slide boundaries, so the chip never drains between slides;
- results are journaled idempotently (``serve_journal.csv``) — a
  restarted server never re-scores a finished slide (same
  artifact-idempotence design as the tile stage's resume journal,
  reference: create_patches_fp.py:99-102, batch_process_utils.py:17-82);
- per-slide outputs keep the reference's artifact schemas: attention
  blockmap h5 (create_heatmaps.py:379-381), optional feature bag in the
  FeatureBagStore layout, one prediction JSON per slide plus an appended
  ``predictions.jsonl`` stream for downstream consumers.

Use ``serve_once`` for a single drain (cron-style batch serving) or
``serve_forever`` for a polling daemon; both share all state through
ServeState so a daemon is just repeated drains.
"""
from __future__ import annotations

import csv
import dataclasses
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from hipt_abmil_atec23_tpu.utils.config import (
    EncoderConfig, ModelConfig, SegConfig, TileConfig)

_DONE_STATUSES = ("done", "failed_seg")


@dataclass
class ServeConfig:
    slide_dir: str
    out_dir: str
    ckpt_path: str                      # flax .ckpt or torch .pt
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    tile: TileConfig = field(default_factory=lambda: TileConfig(
        patch_size=4096, step_size=4096, seg=SegConfig(use_otsu=True)))
    n_classes: int = 2
    poll_s: float = 5.0                 # daemon poll interval
    save_features: bool = False         # persist bags in FeatureBagStore
    top_k: int = 8                      # top-attention regions per slide
    max_retries: int = 3                # 'error' attempts before parking
    min_stable_s: float = 10.0          # mtime age before a file is eligible


@dataclass
class ServeState:
    """Lazily-built heavy objects shared across drains."""
    encoder: object = None
    model: object = None
    params: object = None
    mil_fn: object = None               # jitted bucketed MIL forward


def _journal_path(cfg: ServeConfig) -> str:
    return os.path.join(cfg.out_dir, "serve_journal.csv")


def _journal_scan(cfg: ServeConfig):
    """ONE pass over the journal: (slide_id -> last status,
    slide_id -> ['error' row times], slide_id -> last row time). The
    journal grows forever on a long-lived daemon, so every poll must read
    it once, not per-view. Row TIMES matter: discover() compares them to
    the slide file's mtime so a re-uploaded (replaced) file invalidates
    its own old journal rows."""
    path = _journal_path(cfg)
    status: Dict[str, str] = {}
    errors: Dict[str, list] = {}
    last_time: Dict[str, float] = {}
    if os.path.exists(path):
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                sid = row["slide_id"]
                try:
                    t = float(row.get("time") or 0.0)
                except ValueError:
                    t = 0.0
                status[sid] = row["status"]
                last_time[sid] = t
                if row["status"] == "error":
                    errors.setdefault(sid, []).append(t)
    return status, errors, last_time


def load_journal(cfg: ServeConfig) -> Dict[str, str]:
    """slide_id -> last status."""
    return _journal_scan(cfg)[0]


def _journal_append(cfg: ServeConfig, slide_id: str, status: str,
                    detail: str = "") -> None:
    path = _journal_path(cfg)
    os.makedirs(cfg.out_dir, exist_ok=True)
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["slide_id", "status", "time", "detail"])
        # microsecond precision: discover() compares row times to file
        # mtimes, and a .3f-rounded time written <0.5ms after the mtime
        # can round BELOW it, making a fresh row look pre-replacement
        w.writerow([slide_id, status, f"{time.time():.6f}", detail])


def discover(cfg: ServeConfig) -> List[str]:
    """Slide files in slide_dir not yet finished per the journal.

    Two upload-safety rules:
    - STABILITY: a file whose mtime is younger than ``min_stable_s`` is
      still being copied in (non-atomic uploads write for minutes) — it is
      not eligible yet, so a truncated half-copy is never opened, scored,
      or journaled 'error'/'failed_seg'.
    - REPLACEMENT: journal rows older than the file's mtime belong to a
      previous version of the file. A re-uploaded slide therefore resets
      its own retry budget and clears a stale 'done'/'failed_seg' — no
      manual journal surgery needed to un-park a fixed upload.
    """
    from hipt_abmil_atec23_tpu.slideio.pipeline import SLIDE_EXTS
    journal, errors, last_time = _journal_scan(cfg)
    now = time.time()
    pending = []
    for fname in sorted(os.listdir(cfg.slide_dir)):
        if not fname.lower().endswith(SLIDE_EXTS):
            continue
        path = os.path.join(cfg.slide_dir, fname)
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            continue  # vanished between listdir and stat
        if now - mtime < cfg.min_stable_s:
            continue  # possibly mid-upload; next poll will see it stable
        sid = os.path.splitext(fname)[0]
        replaced = mtime > last_time.get(sid, float("-inf"))
        if journal.get(sid) in _DONE_STATUSES and not replaced:
            continue
        n_err = sum(1 for t in errors.get(sid, ()) if t >= mtime)
        if n_err >= cfg.max_retries:
            # parked: a slide that keeps erroring (e.g. a corrupt upload)
            # must not crash-loop the daemon or starve later arrivals;
            # replacing the file (fresh mtime) un-parks it automatically
            continue
        pending.append(fname)
    return pending


def _ensure_state(cfg: ServeConfig, state: ServeState) -> None:
    if state.encoder is None:
        from hipt_abmil_atec23_tpu.engine.encode import build_encoder
        state.encoder = build_encoder(cfg.encoder)
    if state.model is None:
        import jax
        import jax.numpy as jnp
        from hipt_abmil_atec23_tpu.engine.checkpoint import load_params
        from hipt_abmil_atec23_tpu.models import build_mil_model

        feat_dim = state.encoder.feat_dim
        model = build_mil_model(cfg.model.model_type,
                                size_arg=cfg.model.model_size,
                                n_classes=cfg.n_classes)
        # eager CPU init (CLAUDE.md rule): a cold daemon start must not
        # dispatch dozens of tiny init ops through the TPU tunnel
        with jax.default_device(jax.devices("cpu")[0]):
            template = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((8, feat_dim), jnp.float32), None)
        if cfg.ckpt_path.endswith(".pt"):
            # torch checkpoints load through the key-cleanup converter
            # (reference: eval_utils.py:51-57 initiate_model)
            from hipt_abmil_atec23_tpu.models.convert import (
                clam_params_from_torch, load_torch_state_dict)
            loaded = clam_params_from_torch(
                load_torch_state_dict(cfg.ckpt_path, checkpoint_key=None),
                n_classes=cfg.n_classes,
                multi_branch=cfg.model.model_type == "clam_mb")
            merged = dict(template["params"])
            merged.update(loaded["params"])
            state.params = {"params": merged}
        else:
            state.params = load_params(cfg.ckpt_path, template)
        # pin the weights to the device once (CLAUDE.md: never let jit
        # re-ship or embed them) and jit the full-bag forward. Bags pad
        # to power-of-2 buckets, so each bucket compiles exactly once
        # per daemon lifetime instead of paying per-op dispatch latency
        # through the tunnel on every slide (the eager path costs
        # ~27-250 ms PER OP per slide on this link).
        state.params = jax.device_put(state.params)
        from hipt_abmil_atec23_tpu.ops.gated_attention_pool import (
            apply_pooled)
        state.mil_fn = jax.jit(
            lambda p, bag, mask: apply_pooled(model, p, bag, mask))
        state.model = model


def _mil_bucketed(state: ServeState, feats: np.ndarray):
    """Jitted MIL forward on a power-of-2-padded bag (static shapes;
    one compile per bucket)."""
    import jax.numpy as jnp
    from hipt_abmil_atec23_tpu.ops.masking import pad_bag
    n_pad = max(512, 1 << (max(len(feats), 1) - 1).bit_length())
    bag, mask = pad_bag(feats, n_pad)
    return state.mil_fn(state.params, jnp.asarray(bag), jnp.asarray(mask))


def serve_once(cfg: ServeConfig, state: Optional[ServeState] = None,
               *, verbose: bool = True) -> List[Dict]:
    """Drain every pending slide through one encode_stream pipeline.

    Returns the per-slide prediction records written this drain.
    """
    from hipt_abmil_atec23_tpu.engine.encode import encode_stream
    from hipt_abmil_atec23_tpu.explain.heatmaps import save_blockmap
    from hipt_abmil_atec23_tpu.slideio.patching import enumerate_coords
    from hipt_abmil_atec23_tpu.slideio.reader import open_slide
    from hipt_abmil_atec23_tpu.slideio.seg import segment_tissue

    state = state if state is not None else ServeState()
    os.makedirs(cfg.out_dir, exist_ok=True)
    results_dir = os.path.join(cfg.out_dir, "results")
    os.makedirs(results_dir, exist_ok=True)

    pending = discover(cfg)
    if not pending:
        return []
    _ensure_state(cfg, state)

    # host-side prep: seg + coords per slide, all slides join ONE stream
    jobs, slides, coord_map, records = [], [], {}, []
    for fname in pending:
        sid = os.path.splitext(fname)[0]
        if sid in coord_map:
            # slide identity is the file STEM (journal/artifact key):
            # two files sharing one stem (a.svs + a.tif) would pair one
            # slide's features with the other's coords via coord_map —
            # serve the first, skip the rest loudly. The journal can't
            # distinguish them either, so this is a config error to fix
            # upstream, not a retry case.
            if verbose:
                print(f"[serve] {fname}: SKIPPED — duplicate slide_id "
                      f"'{sid}' in this drain")
            continue
        slide = None
        try:
            slide = open_slide(os.path.join(cfg.slide_dir, fname))
            seg = segment_tissue(slide, cfg.tile.seg)
            coords = enumerate_coords(slide, seg, cfg.tile)
        except Exception as e:  # unreadable file: journal and keep serving
            if slide is not None:  # seg/coords failed after a good open
                slide.close()
            _journal_append(cfg, sid, "error", repr(e))
            if verbose:
                print(f"[serve] {sid}: ERROR {e!r}")
            continue
        if len(coords) == 0:
            slide.close()
            _journal_append(cfg, sid, "failed_seg")
            records.append({"slide_id": sid, "status": "failed_seg"})
            if verbose:
                print(f"[serve] {sid}: no tissue, failed_seg")
            continue
        slides.append(slide)
        coord_map[sid] = coords
        jobs.append((sid, slide, coords))

    store = None
    if cfg.save_features:
        from hipt_abmil_atec23_tpu.data.bags import FeatureBagStore
        store = FeatureBagStore(os.path.join(cfg.out_dir, "features"))

    jsonl = open(os.path.join(cfg.out_dir, "predictions.jsonl"), "a")
    finished = set()

    def _finish(sid, feats):
        """Score + persist one encoded slide (shared by the grouped stream
        and the per-slide isolation fallback)."""
        t_done = time.time()
        coords = coord_map[sid]
        out = _mil_bucketed(state, feats)
        y_prob = np.asarray(out.y_prob)[0]
        scores = np.asarray(out.a_raw)[0][:len(coords)]
        order = np.argsort(scores)[::-1][:cfg.top_k]
        rec = {
            "slide_id": sid,
            "status": "done",
            "y_hat": int(np.asarray(out.y_hat)[0]),
            "p": [float(v) for v in y_prob],
            "n_regions": int(len(coords)),
            "top_regions": [
                [int(coords[i][0]), int(coords[i][1]), float(scores[i])]
                for i in order],
            "time": t_done,
        }
        save_blockmap(os.path.join(results_dir, f"{sid}_blockmap.h5"),
                      coords, scores)
        if store is not None:
            store.save(sid, feats, coords=coords)
        with open(os.path.join(results_dir, f"{sid}.json"), "w") as f:
            json.dump(rec, f, indent=2)
        # journal 'done' + mark finished BEFORE the jsonl append: if the
        # stream append fails here, the per-slide fallback (and the next
        # drain, via the journal) must NOT re-score the slide — a missing
        # jsonl line (the per-slide .json above still exists) is recoverable;
        # a duplicate record double-counts the slide downstream.
        _journal_append(cfg, sid, "done")
        finished.add(sid)
        jsonl.write(json.dumps(rec) + "\n")
        jsonl.flush()
        records.append(rec)
        if verbose:
            print(f"[serve] {sid}: pred {rec['y_hat']} p={rec['p']} "
                  f"({rec['n_regions']} regions)")

    try:
        try:
            for sid, feats in encode_stream(
                    jobs, state.encoder, region_size=cfg.tile.patch_size,
                    patch_level=cfg.tile.patch_level):
                _finish(sid, feats)
        except Exception as e:
            # A mid-stream failure (decode error on a corrupt file, write
            # error, ...) must not abort serving — and must not tar every
            # queued slide with the poison one's brush: fall back to
            # serving each unfinished slide through its OWN stream, so
            # only the slide that actually fails collects an 'error'
            # attempt (bounded retry in discover() eventually parks it).
            if verbose:
                print(f"[serve] grouped stream failed ({e!r}); "
                      f"isolating per slide")
            for job in jobs:
                sid = job[0]
                if sid in finished:
                    continue
                try:
                    for s2, feats in encode_stream(
                            [job], state.encoder,
                            region_size=cfg.tile.patch_size,
                            patch_level=cfg.tile.patch_level):
                        _finish(s2, feats)
                except Exception as e2:
                    if sid in finished:
                        continue  # failed after its own yield — it's done
                    _journal_append(cfg, sid, "error", f"stream: {e2!r}")
                    if verbose:
                        print(f"[serve] {sid}: ERROR {e2!r}")
    finally:
        jsonl.close()
        for s in slides:
            s.close()
    return records


def serve_forever(cfg: ServeConfig, *, stop=None, verbose: bool = True,
                  max_drains: Optional[int] = None) -> int:
    """Polling daemon: drain pending slides, sleep poll_s, repeat.

    ``stop``: optional threading.Event for graceful shutdown;
    ``max_drains`` bounds the loop (tests / cron). Returns the total
    number of slides served.
    """
    state = ServeState()
    served = 0
    drains = 0
    while True:
        try:
            recs = serve_once(cfg, state, verbose=verbose)
            # count slides actually SCORED — failed_seg records are
            # journaled outcomes, not predictions
            served += sum(1 for r in recs if r.get("status") == "done")
        except Exception as e:
            # last-resort isolation (journal/FS errors, transient device
            # failures): a daemon must outlive any single drain. Per-slide
            # faults are already journaled inside serve_once.
            if verbose:
                print(f"[serve] drain failed: {e!r}")
        drains += 1
        if max_drains is not None and drains >= max_drains:
            return served
        if stop is not None and stop.wait(cfg.poll_s):
            return served
        if stop is None:
            time.sleep(cfg.poll_s)


def write_config(cfg: ServeConfig) -> None:
    """Dump the effective serve config next to the journal (mirrors the
    reference's per-run config dump, create_heatmaps.py:95-101)."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    with open(os.path.join(cfg.out_dir, "serve_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
