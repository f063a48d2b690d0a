"""video_gpt_tpu: TPU-native next-clip-diffusion video world models.

Public API (mirrors the reference's `from LVM import ...` surface,
LVM/__init__.py):

    from video_gpt_tpu import (ModelConfig, VideoGPT, VideoGPTPipeline,
                               ImageGenPipeline, SchedulerConfig)

Heavy submodules are imported lazily so `import video_gpt_tpu` stays cheap.
"""

__version__ = "0.1.0"

_EXPORTS = {
    "ModelConfig": ("video_gpt_tpu.config", "ModelConfig"),
    "TrainConfig": ("video_gpt_tpu.config", "TrainConfig"),
    "SchedulerConfig": ("video_gpt_tpu.config", "SchedulerConfig"),
    "MeshConfig": ("video_gpt_tpu.config", "MeshConfig"),
    "stage_config": ("video_gpt_tpu.config", "stage_config"),
    "SequenceLayout": ("video_gpt_tpu.layout", "SequenceLayout"),
    "RowSpec": ("video_gpt_tpu.layout", "RowSpec"),
    "build_layout": ("video_gpt_tpu.layout", "build_layout"),
    "frame_block_inference_layout": (
        "video_gpt_tpu.layout", "frame_block_inference_layout"),
    "VideoGPT": ("video_gpt_tpu.models.video_gpt", "VideoGPT"),
    "Batch": ("video_gpt_tpu.models.video_gpt", "Batch"),
    "AutoencoderKL": ("video_gpt_tpu.models.vae", "AutoencoderKL"),
    "VAEConfig": ("video_gpt_tpu.models.vae", "VAEConfig"),
    "VideoGPTPipeline": ("video_gpt_tpu.sampling.pipeline",
                         "VideoGPTPipeline"),
    "ImageGenPipeline": ("video_gpt_tpu.image_gen", "ImageGenPipeline"),
    "ImageGenProcessor": ("video_gpt_tpu.image_gen", "ImageGenProcessor"),
    "Trainer": ("video_gpt_tpu.training.trainer", "Trainer"),
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    try:
        module_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'video_gpt_tpu' has no attribute "
                             f"{name!r}") from None
    import importlib
    return getattr(importlib.import_module(module_name), attr)
