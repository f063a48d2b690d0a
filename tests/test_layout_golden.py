"""Golden tests: SequenceLayout masks / position-ids / token streams must
reproduce the reference collator (LVM/processor.py) bit-exactly.

The oracle inputs (``mllm_inputs`` dicts) are constructed exactly the way the
reference prompt-template + tokenizer path would produce them
(LVM/processor.py:128-274), using our TokenIds for the structural tokens so
the padded id streams are directly comparable.
"""
import numpy as np
import pytest

from video_gpt_tpu.layout import (
    RowSpec, build_layout, frame_block_inference_layout, render_dense_mask,
    tokens_per_frame)
from video_gpt_tpu.tokens import DEFAULT_TOKEN_IDS as IDS

torch = pytest.importorskip("torch")


def _ref_ids_inference(frame_blocks, n):
    """Token list as produced by process_multi_modal_prompt_frame_block
    (LVM/processor.py:154-177): clean blocks then final noisy block."""
    ids, sizes = [], []
    for k, fb in enumerate(frame_blocks):
        for _ in range(fb):
            if k != len(frame_blocks) - 1:
                ids += [IDS.img_open]
                sizes.append([len(ids), len(ids) + n])
                ids += [IDS.slot] * n
                ids += [IDS.img_close]
            else:
                ids += [IDS.diffusion, IDS.slot]  # <|diffusion|> + time slot
                sizes.append([len(ids), len(ids) + n])
                ids += [IDS.slot] * n
    return ids, sizes


def _ref_ids_training(frame_blocks, n):
    """Per process_multi_modal_prompt_frame_block_training
    (LVM/processor.py:244-274): noisy frames then clean copies per block."""
    ids, sizes = [], []
    for k, fb in enumerate(frame_blocks):
        for _ in range(fb):
            ids += [IDS.diffusion, IDS.slot]
            sizes.append([len(ids), len(ids) + n])
            ids += [IDS.slot] * n
        if k != len(frame_blocks) - 1:
            for _ in range(fb):
                ids += [IDS.img_open]
                sizes.append([len(ids), len(ids) + n])
                ids += [IDS.slot] * n
                ids += [IDS.img_close]
    return ids, sizes


def _mllm(ids, sizes, frame_blocks, h, w, n_pixel_frames):
    pv = [torch.zeros(1, 3, h, w)] * max(n_pixel_frames, 1)
    return {"input_ids": ids, "pixel_values": pv, "image_sizes": sizes,
            "frame_blocks": list(frame_blocks)}


@pytest.mark.parametrize("n_clean,n_gen,h,w,sp", [
    (3, 2, 32, 48, 1),
    (1, 1, 32, 32, 1),
    (5, 3, 48, 32, 4),
])
def test_frame_block_inference_cfg_pair(ref, n_clean, n_gen, h, w, sp):
    n = tokens_per_frame(h, w)
    cond_ids, cond_sizes = _ref_ids_inference([n_clean, n_gen], n)
    unc_ids, unc_sizes = _ref_ids_inference([0, n_gen], n)
    inputs = [
        _mllm(cond_ids, cond_sizes, [n_clean, n_gen], h, w, n_clean + n_gen),
        _mllm(unc_ids, unc_sizes, [0, n_gen], h, w, n_gen),
    ]
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=sp)
    (pad_ids, pos_ids, mask, _pv, _sizes, _fb
     ) = coll.process_mllm_input_frame_block_inference(inputs)

    layout = frame_block_inference_layout(
        n_clean, n_gen, n, use_cfg=True, pad_to_multiple=sp)

    np.testing.assert_array_equal(layout.input_ids, pad_ids.numpy())
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout), mask.numpy())


@pytest.mark.parametrize("frame_blocks,h,w,sp", [
    ([1, 1, 1, 1], 32, 32, 1),        # stage-1 interleaved == blocks of 1
    ([2, 3], 32, 48, 1),
    ([3, 1, 2], 32, 32, 4),
    ([1, 4, 2, 1], 48, 32, 8),
])
def test_frame_block_training(ref, frame_blocks, h, w, sp):
    n = tokens_per_frame(h, w)
    ids, sizes = _ref_ids_training(frame_blocks, n)
    inputs = [_mllm(ids, sizes, frame_blocks, h, w, sum(frame_blocks))]
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=sp)
    (pad_ids, pos_ids, mask, _pv, _sizes, _fb
     ) = coll.process_mllm_input_frame_block_training(inputs)

    layout = build_layout(
        [RowSpec(tuple(frame_blocks), "training")], n, pad_to_multiple=sp)

    np.testing.assert_array_equal(layout.input_ids, pad_ids.numpy())
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout), mask.numpy())


def test_training_ragged_batch_padding(ref):
    """Two rows of different length: left-padding + pad-row mask semantics."""
    n = tokens_per_frame(32, 32)
    rows = [[2, 2], [1, 1, 1, 1, 1]]
    inputs = []
    for fb in rows:
        ids, sizes = _ref_ids_training(fb, n)
        inputs.append(_mllm(ids, sizes, fb, 32, 32, sum(fb)))
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=1)
    (pad_ids, pos_ids, mask, _pv, _sizes, _fb
     ) = coll.process_mllm_input_frame_block_training(inputs)

    layout = build_layout(
        [RowSpec(tuple(fb), "training") for fb in rows], n)

    np.testing.assert_array_equal(layout.input_ids, pad_ids.numpy())
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout), mask.numpy())


def test_stage1_interleaved_equals_unit_blocks(ref):
    """The stage-1 interleaved scheme (create_mask_training /
    create_position_training, LVM/processor.py:442-467,575-616) is exactly
    frame_blocks=[1]*F."""
    F, h, w = 4, 32, 48
    n = tokens_per_frame(h, w)
    # stage-1 token stream per process_multi_modal_prompt_training
    # (LVM/processor.py:205-217): [diff, time, img*n] [open, img*n, close] ...
    ids, sizes = [], []
    for i in range(F):
        ids += [IDS.diffusion, IDS.slot]
        sizes.append([len(ids), len(ids) + n])
        ids += [IDS.slot] * n
        if i < F - 1:
            ids += [IDS.img_open]
            sizes.append([len(ids), len(ids) + n])
            ids += [IDS.slot] * n
            ids += [IDS.img_close]
    inputs = [{"input_ids": ids, "pixel_values": [torch.zeros(1, 3, h, w)],
               "image_sizes": sizes}]
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=1)
    pad_ids, pos_ids, mask, _pv, _sizes = coll.process_mllm_input_training(
        inputs)

    layout = build_layout([RowSpec((1,) * F, "training")], n)

    np.testing.assert_array_equal(layout.input_ids, pad_ids.numpy())
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout), mask.numpy())


def test_gather_maps_consistency():
    n = tokens_per_frame(32, 32)
    layout = frame_block_inference_layout(3, 2, n, use_cfg=True)
    # every noisy frame has exactly one TIME slot and n patches
    assert layout.num_noisy_frames == 4  # 2 cond + 2 uncond
    assert layout.num_clean_frames == 3
    assert (layout.time_src >= 0).sum() == 4
    assert (layout.noisy_src >= 0).sum() == 4 * n
    assert (layout.clean_src >= 0).sum() == 3 * n
    # gather indices point at NOISY_IMG tokens
    flat_kind = layout.kind.reshape(-1)
    assert (flat_kind[layout.noisy_gather.reshape(-1)] == 3).all()
    assert (flat_kind[layout.clean_gather.reshape(-1)] == 5).all()
    # noisy tail is contiguous
    assert layout.noisy_tail_len() == 2 * (n + 2)


def test_block_aware_mask_matches_reference(ref):
    """Coarse block-aware variant vs create_block_mask_training
    (LVM/processor.py:733-774) through process_mllm_input_training."""
    F, h, w = 4, 32, 32
    n = tokens_per_frame(h, w)
    ids, sizes = [], []
    for i in range(F):
        ids += [IDS.diffusion, IDS.slot]
        sizes.append([len(ids), len(ids) + n])
        ids += [IDS.slot] * n
        if i < F - 1:
            ids += [IDS.img_open]
            sizes.append([len(ids), len(ids) + n])
            ids += [IDS.slot] * n
            ids += [IDS.img_close]
    inputs = [{"input_ids": ids, "pixel_values": [torch.zeros(1, 3, h, w)],
               "image_sizes": sizes}]
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=1)
    pad_ids, pos_ids, mask, _pv, _sizes = coll.process_mllm_input_training(
        inputs, block_aware=True)

    layout = build_layout([RowSpec((1,) * F, "training", block_aware=True)],
                          n)
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout),
                                  mask.numpy().astype(bool))
