"""Host-side frame preprocessing.

Equivalent of the reference's image path (LVM/processor.py:41-67 crop_arr +
torchvision Normalize): downscale-by-halving while >= 2x target, bicubic
resize to fit ``max_image_size``, upscale tiny frames, center-crop to a
multiple of 16, normalize to [-1, 1]. Output is NHWC float32 ready for the
jitted VAE encode. A C++ fast path (native/) replaces the PIL resize when
built; semantics are identical.
"""
from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np
from PIL import Image


def crop_arr(img: Image.Image, max_image_size: int) -> Image.Image:
    """Resize/crop policy of LVM/processor.py:41-67."""
    while min(img.size) >= 2 * max_image_size:
        img = img.resize(tuple(x // 2 for x in img.size), Image.BOX)
    if max(img.size) > max_image_size:
        scale = max_image_size / max(img.size)
        img = img.resize(tuple(round(x * scale) for x in img.size),
                         Image.BICUBIC)
    if min(img.size) < 16:
        scale = 16 / min(img.size)
        img = img.resize(tuple(round(x * scale) for x in img.size),
                         Image.BICUBIC)
    arr = np.asarray(img)
    cy, cx = arr.shape[0] % 16, arr.shape[1] % 16
    y0, x0 = cy // 2, cx // 2
    arr = arr[y0: arr.shape[0] - (cy - y0), x0: arr.shape[1] - (cx - x0)]
    return Image.fromarray(arr)


def preprocess_frames(frames: Sequence, max_image_size: int) -> np.ndarray:
    """PIL images / HWC uint8 arrays -> [N, H, W, 3] float32 in [-1, 1].
    All frames must share a resolution after cropping (video path).

    Idempotent: an already-preprocessed [N, H, W, 3] float32 stack is
    returned as-is, so callers that bucket videos by preprocessed shape
    (cli generate --video_path_dir, bench_suite) can preprocess once and
    pass the arrays straight into generate_batch."""
    if (isinstance(frames, np.ndarray) and frames.ndim == 4
            and frames.dtype == np.float32):
        return frames
    out: List[np.ndarray] = []
    for f in frames:
        img = f if isinstance(f, Image.Image) else Image.fromarray(
            np.asarray(f))
        img = img.convert("RGB")
        img = crop_arr(img, max_image_size)
        arr = np.asarray(img, np.float32) / 255.0
        out.append((arr - 0.5) / 0.5)
    shapes = {a.shape for a in out}
    assert len(shapes) == 1, f"mixed frame shapes after crop: {shapes}"
    return np.stack(out)


def postprocess_frames(pixels: np.ndarray) -> List[Image.Image]:
    """[N, H, W, 3] in [-1, 1] -> PIL images (LVM/pipeline.py:585-589).

    uint8 input is taken as already-converted pixels (the pipeline's
    ``_decode_u8`` fuses the clip/scale/truncate into the VAE-decode jit on
    device — same ops, same f32 order, bit-identical bytes — so the host
    does no float math and the device->host transfer is 4x smaller)."""
    x = np.asarray(pixels)
    if x.dtype != np.uint8:
        x = np.clip(x.astype(np.float32) * 0.5 + 0.5, 0.0, 1.0)
        x = (x * 255.0).astype(np.uint8)
    return [Image.fromarray(f) for f in x]
