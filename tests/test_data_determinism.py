"""Video data sampling is resume- and worker-count-deterministic.

The reference draws start/stride/partition from a shared stateful RNG
(LVM/train_helper/data.py:174-231), so a resumed run replays DIFFERENT
clips than the uninterrupted run would have, and with several workers the
draw interleaving is scheduler-dependent. Here every sample is a pure
function of (seed, shard, epoch, index, attempt) — the scheme
data/image_text.py:114-120 already used for images.
"""
import numpy as np
import pytest

from video_gpt_tpu.data.prefetch import Prefetcher
from video_gpt_tpu.data.video import VideoClipDataset

VIDS = "/root/reference/vids"


def _ds(**kw):
    d = dict(frame_num=4, frame_interval=2, flexible_interval=True,
             interval_bound=6, target_resolution=(48, 64),
             scheme="frame_block", seed=3)
    d.update(kw)
    return VideoClipDataset(VIDS, **d)


def test_sample_is_pure_function_of_index():
    ds = _ds()
    a, b = ds.sample(1), ds.sample(1)
    np.testing.assert_array_equal(a.pixels, b.pixels)
    assert a.frame_blocks == b.frame_blocks
    # a second independently-constructed dataset draws the same sample
    c = _ds().sample(1)
    np.testing.assert_array_equal(a.pixels, c.pixels)
    assert a.frame_blocks == c.frame_blocks
    # wraparound (next epoch over the same video) is a FRESH draw
    e = ds.sample(1 + len(ds))
    assert (a.frame_blocks != e.frame_blocks
            or not np.array_equal(a.pixels, e.pixels))
    # other seeds / shards draw differently
    f = _ds(seed=4).sample(1)
    assert (a.frame_blocks != f.frame_blocks
            or not np.array_equal(a.pixels, f.pixels))


def test_worker_count_does_not_change_the_stream():
    """workers=4 must produce the exact batch stream of workers=1 (the
    draws no longer depend on which thread runs a sample first)."""
    n = 8

    def stream(workers):
        ds = _ds()
        pf = Prefetcher(ds.sample, depth=4, workers=workers)
        try:
            return [pf.get() for _ in range(n)]
        finally:
            pf.close()

    s1, s4 = stream(1), stream(4)
    for a, b in zip(s1, s4):
        np.testing.assert_array_equal(a.pixels, b.pixels)
        assert a.frame_blocks == b.frame_blocks


def test_prefetcher_resume_matches_uninterrupted_stream():
    """Prefetcher(start=k) — the Trainer resume path — continues with
    bit-identical samples to the uninterrupted run's tail."""
    ds = _ds()
    pf = Prefetcher(ds.sample, depth=2, workers=2)
    try:
        full = [pf.get() for _ in range(6)]
    finally:
        pf.close()
    pf2 = Prefetcher(ds.sample, depth=2, workers=2, start=3)
    try:
        resumed = [pf2.get() for _ in range(3)]
    finally:
        pf2.close()
    for a, b in zip(full[3:], resumed):
        np.testing.assert_array_equal(a.pixels, b.pixels)
        assert a.frame_blocks == b.frame_blocks


def test_retry_draw_is_deterministic(tmp_path):
    """A broken video triggers the retry path; the replacement draw is part
    of the same pure function (attempt folds into the seed)."""
    import shutil
    (tmp_path / "broken.mp4").write_bytes(b"not a video")
    shutil.copy(f"{VIDS}/plane.mp4", tmp_path / "z.mp4")
    ds = VideoClipDataset(str(tmp_path), frame_num=2, frame_interval=2,
                          target_resolution=(48, 64), seed=0)
    assert len(ds) == 2  # broken.mp4 sorts first -> index 0 retries
    a = ds.sample(0)
    b = ds.sample(0)
    np.testing.assert_array_equal(a.pixels, b.pixels)


@pytest.mark.slow
def test_trainer_resume_replays_identical_batches(tmp_path):
    """A Trainer resumed from a mid-run checkpoint consumes bit-identical
    batches to the uninterrupted run (VERDICT r3 ask #2)."""
    import jax
    from video_gpt_tpu.config import ModelConfig, TrainConfig
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer

    def make_trainer(results_dir, num_workers=2):
        cfg = TrainConfig(frame_num=2, frame_block_scheme="frame_block",
                          flexible_interval=True, interval_bound=6,
                          mixed_precision="no", lr=1e-3,
                          lr_scheduler="constant", log_every=10,
                          ckpt_every=2, num_workers=num_workers,
                          results_dir=str(results_dir))
        return Trainer(ModelConfig.tiny(attn_impl="reference",
                                        pos_embed_max_size=192), cfg,
                       VIDS, vae_cfg=VAEConfig.tiny(),
                       target_resolution=(48, 64))

    def record_batches(t):
        rec = []
        orig = t._shard_batch

        def spy(tb):
            rec.append(np.asarray(tb.pixels, np.float32).copy())
            return orig(tb)

        t._shard_batch = spy
        return rec

    # uninterrupted run: 4 steps (with 4 workers racing)
    t_full = make_trainer(tmp_path / "full", num_workers=4)
    full = record_batches(t_full)
    t_full.run(4)
    assert len(full) == 4

    # interrupted run: 2 steps, checkpoint at step 2, then a FRESH Trainer
    # auto-resumes and runs steps 2..3
    t_a = make_trainer(tmp_path / "resumed")
    t_a.run(2)
    t_b = make_trainer(tmp_path / "resumed", num_workers=1)
    resumed = record_batches(t_b)
    state = t_b.run(4)
    assert int(state.step) == 4
    assert len(resumed) == 2  # steps 2 and 3 only

    for a, b in zip(full[2:], resumed):
        np.testing.assert_array_equal(a, b)
