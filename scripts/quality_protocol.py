"""Self-consistent quality protocol through TRAINED weights.

Every quality-sensitive number in rounds 1-4 (schedule drift, the serving
frontier, distillation) was measured through randomly initialised weights —
the only option with no released checkpoint. This protocol removes that
caveat WITHOUT released weights, as a self-consistency experiment:

  1. TRAIN a small-but-real model (hidden 256, 8 layers) on the repo's
     sample videos (vids/*) to non-trivial loss — stage-1 recipe
     (16 frames, interval 4, 176x320 -> 220 tokens/frame,
     pretrain_stage1_nv.sh:32-47 shapes at reduced width).
  2. DISTILL it (training/distill.py): one classic halving round
     10 -> 5 steps (substeps=2 on the 10-point grid) and one 8 -> 4 round,
     both from the trained teacher, continue-from-teacher recipe
     (distill_lr=1e-4).
  3. MEASURE, through those trained weights, on a REAL video clip's
     conditioning frames:
       - schedule drift: serving schedules (cfg_interval, uncond_refresh,
         fewer-step grids) vs the reference trajectory = 50 guided Euler
         steps (inference_nv.sh:30 semantics), relative final-latent MSE;
       - distillation quality: student@5 / student@4 final latents vs the
         teacher@50 reference, against the teacher's own plain 5/4-step
         samples (the distillation win = how much closer the student lands).

Outputs:
  artifacts/drift_frontier_r05.jsonl — one JSON line per schedule, each
      carrying {"weights": "trained"} (replaces the randomised-head rows)
  artifacts/quality_r05.json        — protocol summary (losses, rel MSEs)
  artifacts/quality_r05/            — checkpoints (resumable phases)

Runtime knobs (env): TRAIN_STEPS (default 400), DISTILL_STEPS (300),
N_CLEAN (8), N_GEN (16). Run from the repo root on the chip.

QP_PHASES=guided runs ONLY the guidance-distillation arm (phase 1 teacher
+ phase 2b + its measurement) and APPENDS the gstudent/diagnostic rows to
the existing frontier artifact instead of rewriting it. Rationale: phase
2b was added after the committed full run; the full protocol is ~3h on
this host while the guided arm alone fits in a round. The teacher train
is deterministic (pure-function data sampling, fixed PRNG seeds), so the
re-trained teacher reproduces the committed run's teacher; the guided
arm re-measures two committed plain schedules ("repro" sanity rows,
recorded in the summary only) to confirm that before appending.
QP_GUIDED=5,4 restricts which student step-counts are distilled.

The VAE is a fresh tiny /8 autoencoder (deterministic init, fixed seed —
models/vae.py): the protocol measures the LVM's trajectory dynamics in its
own latent space, not perceptual quality; there is no pretrained VAE in
this environment either.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.config import ModelConfig, SchedulerConfig, TrainConfig
from video_gpt_tpu.layout import (decode_rank, frame_block_inference_layout,
                                  tokens_per_frame)
from video_gpt_tpu.models.vae import AutoencoderKL, VAEConfig
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT, decode_mask
from video_gpt_tpu.sampling.scheduler import (sample, sample_separate_cfg,
                                              step_kinds)
from video_gpt_tpu.training.trainer import Trainer

# geometry/LR env-tunable: the per-step wall on the tunneled chip is
# dominated by pixel transfer + host video decode, so a lower resolution
# buys proportionally more optimizer steps for the same wall-clock
H = int(os.environ.get("QP_H", 176))
W = int(os.environ.get("QP_W", 320))
LR = float(os.environ.get("QP_LR", 1e-4))
N_CLEAN = int(os.environ.get("N_CLEAN", 8))
N_GEN = int(os.environ.get("N_GEN", 16))
TRAIN_STEPS = int(os.environ.get("TRAIN_STEPS", 400))
DISTILL_STEPS = int(os.environ.get("DISTILL_STEPS", 300))
VIDEO_DIR = os.environ.get("VIDEO_DIR", "/root/reference/vids")
TAG = os.environ.get("QP_TAG", "r05")  # artifact suffix (smoke runs
# point this elsewhere so they don't clobber the committed numbers)
OUT_DIR = os.path.join(REPO, "artifacts", f"quality_{TAG}")
REF_STEPS = 50  # reference serving step count, inference_nv.sh:30
PHASES = os.environ.get("QP_PHASES", "all")  # all | guided
GUIDED = tuple(int(s) for s in
               os.environ.get("QP_GUIDED", "5,4,3").split(",") if s)
# plain schedules re-measured in guided-only mode to confirm the
# re-trained teacher reproduces the committed run (summary-only rows)
REPRO_SWEEP = ("steps=5", "steps=10,k=3")

MODEL = ModelConfig(hidden_size=256, num_layers=8, num_heads=8,
                    num_kv_heads=8, intermediate_size=1024,
                    attn_impl="auto")
VAE = VAEConfig.tiny()

# drift sweep re-measured through trained weights. Two references:
# - rows at steps=10 are compared against the 10-step always-CFG
#   trajectory (SCHEDULE-ONLY drift — the same semantics as the r04
#   randomised-head sweep and bench.py's serving_drift field);
# - fewer-step rows and the distilled students are compared against the
#   50-step always-CFG reference (the reference serving recipe,
#   inference_nv.sh:30 — the honest quality bound incl. discretization).
DRIFT_SWEEP = (
    "steps=10;"
    "steps=10,ival=0.15:0.7;steps=10,ival=0.15:0.7,k=2;"
    "steps=10,ival=0.15:0.7,k=3;steps=10,k=2;steps=10,k=3;"
    "steps=8;steps=8,k=2;steps=6;steps=6,k=2;"
    "steps=5;steps=5,k=2;steps=5,k=3;steps=4;steps=4,k=2;steps=3,k=2"
)


def _train_cfg(results_dir, **kw):
    base = dict(frame_num=16, frame_interval=4,
                frame_block_scheme="frame_block", mixed_precision="no",
                lr=LR, lr_scheduler="constant_with_warmup",
                lr_warmup_steps=20, log_every=50, ckpt_every=100_000,
                results_dir=results_dir,
                # this host has ONE CPU core (see .claude/skills/verify):
                # more workers just thrash it — the step wall is host video
                # decode + dispatch, ~1-2 s/step at 96x160 when run alone
                num_workers=2, prefetch_depth=2)
    base.update(kw)
    return TrainConfig(**base)


def phase_train():
    """Stage-1-style pretrain of the small teacher. Resumable (orbax)."""
    # ckpt_every == the run length: the FINAL state is durable, so a
    # re-invocation resumes straight past the phase (auto_resume)
    cfg = _train_cfg(os.path.join(OUT_DIR, "teacher"),
                     ckpt_every=TRAIN_STEPS)
    t = Trainer(MODEL, cfg, VIDEO_DIR, vae_cfg=VAE,
                target_resolution=(H, W))
    state = t.run(TRAIN_STEPS)
    return t, state


def phase_distill(teacher_params, student_steps, substeps, tag,
                  guidance=None):
    """One distillation round from the trained teacher. ``guidance``
    switches on guidance distillation (training/distill.py cfg_scale):
    the student bakes uncond + w*(cond - uncond) in and serves with
    use_cfg=False."""
    cfg = _train_cfg(os.path.join(OUT_DIR, f"student{tag}"), distill=True,
                     distill_student_steps=student_steps,
                     distill_substeps=substeps, lr_scheduler="constant",
                     distill_guidance=guidance,
                     ckpt_every=DISTILL_STEPS)
    t = Trainer(MODEL, cfg, VIDEO_DIR, vae_cfg=VAE,
                target_resolution=(H, W), init_params=teacher_params)
    state = t.run(DISTILL_STEPS)
    return state.params


def _eval_context(trainer):
    """Real conditioning latents: first N_CLEAN frames of a real clip,
    encoded by the SAME VAE the model was trained through."""
    from video_gpt_tpu.data.video import VideoClipDataset
    ds = VideoClipDataset(VIDEO_DIR, frame_num=N_CLEAN, frame_interval=4,
                          target_resolution=(H, W), scheme="frame_block",
                          seed=123)
    pix = jnp.asarray(ds.sample(0).pixels)  # [N_CLEAN, H, W, 3]
    vae = AutoencoderKL(VAE, dtype=jnp.float32)
    clean = vae.apply(trainer._vae_params, pix, jax.random.PRNGKey(5),
                      method=AutoencoderKL.encode)
    return clean.astype(jnp.float32)


def make_runner(params, clean, guided=False):
    """schedule -> final latents, through the cached serving path
    (prefill -> decode, separate-CFG; mirrors scripts/cfg_drift.py).
    ``guided=True`` serves a guidance-distilled student: conditional
    context only, use_cfg=False — ONE forward per step."""
    model = VideoGPT(MODEL, dtype=jnp.float32)
    n = tokens_per_frame(H, W)
    hl, wl = H // 8, W // 8
    layout_c = frame_block_inference_layout(N_CLEAN, N_GEN, n,
                                            use_cfg=False)
    layout_u = frame_block_inference_layout(0, N_GEN, n, use_cfg=False)
    batch_c = Batch.from_layout(layout_c)
    batch_u = Batch.from_layout(layout_u)
    tail = layout_c.noisy_tail_len()
    prefix = layout_c.length - tail
    assert decode_rank(layout_c, tail) is not None
    z0 = jax.random.normal(jax.random.PRNGKey(11),
                           (N_GEN, hl, wl, MODEL.in_channels), jnp.float32)

    def run(sched: SchedulerConfig, p=params):
        @jax.jit
        def clip(p, clean, z0):
            cache = model.apply(p, batch_c, clean, prefix,
                                method=VideoGPT.prefill)
            bias_c = decode_mask(batch_c.meta.tail(tail), batch_c.meta)
            bias_u = decode_mask(batch_u.meta, batch_u.meta)

            def denoise_cond(z, t):
                return model.apply(p, batch_c, z, t, cache, tail, bias_c,
                                   method=VideoGPT.decode)

            if guided:
                return sample(z0, denoise_cond, sched, use_cfg=False)

            def denoise_pair(z, t):
                return (denoise_cond(z, t),
                        model.apply(p, batch_u, z, t, bias=bias_u))

            return sample_separate_cfg(z0, denoise_pair, sched,
                                       cfg_scale=1.5,
                                       denoise_cond_fn=denoise_cond)

        return np.asarray(clip(p, clean, z0), np.float32)

    return run


def parse_schedule(spec: str):
    steps, shift, ival, k = REF_STEPS, 1.0, None, 1
    for part in spec.split(","):
        key, _, val = part.strip().partition("=")
        if key == "steps":
            steps = int(val)
        elif key == "shift":
            shift = float(val)
        elif key == "ival":
            ival = (None if val in ("none", "") else
                    tuple(float(x) for x in val.split(":")))
        elif key == "k":
            k = int(val)
        elif key:
            raise ValueError(f"unknown key {key!r} in {spec!r}")
    return SchedulerConfig(num_steps=steps, time_shifting_factor=shift,
                           prediction_type="x1", cfg_interval=ival,
                           uncond_refresh=k)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    t0 = time.time()
    summary = {"model": {"hidden": MODEL.hidden_size,
                         "layers": MODEL.num_layers},
               "geometry": {"h": H, "w": W, "n_clean": N_CLEAN,
                            "n_gen": N_GEN},
               "train_steps": TRAIN_STEPS, "distill_steps": DISTILL_STEPS}

    print("== phase 1: train the teacher ==", flush=True)
    trainer, state = phase_train()
    teacher = jax.tree.map(np.asarray, state.params)
    summary["teacher_final_loss_note"] = "see teacher/ logs"

    students = []
    if PHASES == "all":
        print("== phase 2: distill 10->5, 8->4, 6->3 ==", flush=True)
        for steps in (5, 4, 3):
            p = jax.tree.map(np.asarray,
                             phase_distill(teacher, steps, 2, str(steps)))
            students.append((f"student{steps}", p, steps))

    print(f"== phase 2b: guidance distillation (w=1.5) -> {GUIDED} ==",
          flush=True)
    gstudents = []
    for steps in GUIDED:
        p = jax.tree.map(np.asarray,
                         phase_distill(teacher, steps, 2, f"g{steps}",
                                       guidance=1.5))
        gstudents.append((f"gstudent{steps}", p, steps))

    print("== phase 3: measure ==", flush=True)
    clean = _eval_context(trainer)
    run_teacher = make_runner(teacher, clean)
    ref50 = run_teacher(SchedulerConfig(num_steps=REF_STEPS,
                                        prediction_type="x1"))
    ref10 = run_teacher(SchedulerConfig(num_steps=10,
                                        prediction_type="x1"))
    d50 = float(np.mean(ref50 ** 2))
    d10 = float(np.mean(ref10 ** 2))

    frontier_path = os.path.join(REPO, "artifacts",
                                 f"drift_frontier_{TAG}.jsonl")
    rows = []
    sweep = DRIFT_SWEEP if PHASES == "all" else ";".join(REPRO_SWEEP)
    for spec in sweep.split(";"):
        sched = parse_schedule(spec)
        out = run_teacher(sched)
        kinds = step_kinds(sched)
        n_uncond = sum(k == "cfg" for k in kinds)
        # 10-step rows: schedule-only drift vs the 10-step always-CFG
        # trajectory (r04/bench.py semantics); fewer-step rows: vs the
        # 50-step reference recipe (incl. discretization)
        ref, denom, ref_name = ((ref10, d10, "10-step always-CFG")
                                if sched.num_steps == 10
                                else (ref50, d50, "50-step always-CFG"))
        row = {
            "weights": "trained",
            "schedule": spec.strip(),
            "num_steps": sched.num_steps,
            "time_shift": sched.time_shifting_factor,
            "cfg_interval": sched.cfg_interval,
            "uncond_refresh": sched.uncond_refresh,
            "uncond_evals": int(n_uncond),
            "reference": ref_name,
            "rel_cost": round((sched.num_steps + 0.47 * n_uncond)
                              / (REF_STEPS * 1.47), 4),
            "rel_final_latent_mse": round(
                float(np.mean((out - ref) ** 2)) / denom, 6),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # distilled students served at their own step count (+ k=2 reuse)
    student_rows = []
    for name, p, steps in students:
        run_s = make_runner(jax.tree.map(jnp.asarray, p), clean)
        for k in (1, 2):
            sched = SchedulerConfig(num_steps=steps, prediction_type="x1",
                                    uncond_refresh=k)
            out = run_s(sched)
            kinds = step_kinds(sched)
            n_uncond = sum(kk == "cfg" for kk in kinds)
            row = {
                "weights": "trained+distilled",
                "schedule": f"{name}@{steps}" + (f",k={k}" if k > 1
                                                 else ""),
                "num_steps": steps,
                "uncond_refresh": k,
                "uncond_evals": int(n_uncond),
                "reference": "50-step always-CFG (teacher)",
                "rel_cost": round((steps + 0.47 * n_uncond)
                                  / (REF_STEPS * 1.47), 4),
                "rel_final_latent_mse": round(
                    float(np.mean((out - ref50) ** 2)) / d50, 6),
            }
            student_rows.append(row)
            print(json.dumps(row), flush=True)

    # guidance-distilled students: CFG baked in, served with ONE forward
    # per step (use_cfg=False — no unconditional context at all), still
    # scored against the teacher's guided 50-step reference. The
    # "teacher_noCFG@10" diagnostic shows how far the raw conditional
    # model lands from the guided reference — the gap guidance
    # distillation has to close.
    diag = make_runner(teacher, clean, guided=True)(
        SchedulerConfig(num_steps=10, prediction_type="x1"))
    row = {
        "weights": "trained", "schedule": "teacher_noCFG@10",
        "num_steps": 10, "uncond_refresh": 0, "uncond_evals": 0,
        "reference": "50-step always-CFG (teacher)",
        "rel_cost": round(10 / (REF_STEPS * 1.47), 4),
        "rel_final_latent_mse": round(
            float(np.mean((diag - ref50) ** 2)) / d50, 6),
    }
    student_rows.append(row)
    print(json.dumps(row), flush=True)
    for name, p, steps in gstudents:
        run_g = make_runner(jax.tree.map(jnp.asarray, p), clean,
                            guided=True)
        out = run_g(SchedulerConfig(num_steps=steps, prediction_type="x1"))
        row = {
            "weights": "trained+guided-distilled",
            "schedule": f"{name}@{steps}",
            "num_steps": steps, "uncond_refresh": 0, "uncond_evals": 0,
            "reference": "50-step always-CFG (teacher)",
            "rel_cost": round(steps / (REF_STEPS * 1.47), 4),
            "rel_final_latent_mse": round(
                float(np.mean((out - ref50) ** 2)) / d50, 6),
            "train_steps": TRAIN_STEPS, "distill_steps": DISTILL_STEPS,
        }
        student_rows.append(row)
        print(json.dumps(row), flush=True)

    qpath = os.path.join(REPO, "artifacts", f"quality_{TAG}.json")
    if PHASES == "all":
        with open(frontier_path, "w") as f:
            for row in rows + student_rows:
                f.write(json.dumps(row) + "\n")
        # the distillation win: student@S vs the teacher's own plain
        # S-step sample
        summary["teacher_plain"] = {
            r["schedule"]: r["rel_final_latent_mse"]
            for r in rows if r["schedule"].startswith("steps=")}
        summary["students"] = {
            r["schedule"]: r["rel_final_latent_mse"]
            for r in student_rows
            if r["schedule"].startswith(("student", "gstudent"))}
        summary["diagnostics"] = {
            r["schedule"]: r["rel_final_latent_mse"]
            for r in student_rows
            if r["schedule"].startswith("teacher")}
        summary["distill_guidance"] = 1.5
        summary["elapsed_s"] = round(time.time() - t0, 1)
    else:
        # guided-only arm: APPEND the new rows; the committed plain rows
        # stand. The repro sweep (re-measured through the re-trained
        # teacher) is recorded in the summary only — its schedule keys
        # would otherwise overwrite the committed full-sweep rows.
        with open(frontier_path, "a") as f:
            for row in student_rows:
                f.write(json.dumps(row) + "\n")
        try:
            with open(qpath) as f:
                summary = json.load(f)
        except OSError:
            pass
        committed = summary.get("teacher_plain", {})
        summary["guided"] = {
            "distill_guidance": 1.5,
            "students": {r["schedule"]: r["rel_final_latent_mse"]
                         for r in student_rows
                         if r["schedule"].startswith("gstudent")},
            "diagnostics": {r["schedule"]: r["rel_final_latent_mse"]
                            for r in student_rows
                            if r["schedule"].startswith("teacher")},
            # teacher-reproducibility check: re-measured plain schedules
            # vs the committed full-run values (same seeds/recipe)
            "teacher_repro": {
                r["schedule"]: {"remeasured": r["rel_final_latent_mse"],
                                "committed": committed.get(r["schedule"])}
                for r in rows},
            "elapsed_s": round(time.time() - t0, 1),
        }
        summary.setdefault("students", {}).update(
            summary["guided"]["students"])
    with open(qpath, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"quality_protocol": "done", "phases": PHASES,
                      "elapsed_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
