"""Command-line entry points: ``train`` and ``generate``.

One typed CLI replacing the reference's per-driver argparse + shell-script
sprawl (LVM/train/train_x1_stage*.py:466-601, LVM/script/**). Flag names
follow the reference where they map 1:1.
"""
from __future__ import annotations

import argparse
import os


def _model_cfg(args):
    from .config import ModelConfig
    tp = int(getattr(args, "mesh_tensor", 1) or 1)
    if args.tiny_model:
        return ModelConfig.tiny(pos_embed_max_size=192, tensor_parallel=tp)
    return ModelConfig(tensor_parallel=tp)


def _detect_ckpt_tp(checkpoint_dir) -> int:
    """tensor_parallel layout of an orbax checkpoint, read from the run's
    train_args.json (written next to checkpoints/ by Trainer.run). Orbax
    checkpoints carry the layout of the run that wrote them; missing
    metadata means a pre-TP run: the standard fused layout (tp=1)."""
    import json
    meta = os.path.join(os.path.dirname(os.path.normpath(checkpoint_dir)),
                        "train_args.json")
    try:
        with open(meta) as f:
            return int(json.load(f)["model"].get("tensor_parallel", 1))
    except Exception:
        return 1


def _convert_tp(tree, cfg, tp_src: int, tp_dst: int):
    """Convert a param/adapter tree between fused-column layouts
    (parallel/tensor.py): source-grouped -> standard -> target-grouped."""
    if tp_src == tp_dst:
        return tree
    from .parallel.tensor import tp_regroup_params
    tree = tp_regroup_params(tree, cfg, tp=tp_src, inverse=True)
    return tp_regroup_params(tree, cfg, tp=tp_dst)


def cmd_train(args):
    import jax.numpy as jnp

    from .config import stage_config
    from .models.vae import VAEConfig
    from .parallel.distributed import init_runtime
    from .training.trainer import Trainer
    from .utils.cache import enable_compilation_cache

    # multi-host: wire jax.distributed BEFORE any backend use (reference
    # calls init_npu_env on every launch, parallel_states.py:66-81);
    # no-ops without a coordinator address in the environment
    init_runtime()
    enable_compilation_cache()
    cfg = stage_config(
        args.stage,
        frame_num=args.frame_num or {1: 16, 2: 48, 3: 48, 4: 80}[args.stage],
        batch_size_per_device=args.batch_size_per_device,
        lr=args.lr,
        results_dir=args.results_dir,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        mixed_precision=args.mixed_precision,
        use_ema=args.use_ema,
        input_noise=args.input_noise,
        auto_resume=not args.no_auto_resume,
        use_lora=args.use_lora,
        lora_rank=args.lora_rank,
        sp_attention=args.sp_attention,
        pp_microbatches=args.pp_microbatches,
        cls_weight=args.cls_weight,
        input_output_return=args.input_output_return,
        offload_optimizer=args.offload_optimizer,
        offload_grad_splits=args.offload_grad_splits,
        distill=args.distill,
        distill_student_steps=args.distill_student_steps,
        distill_substeps=args.distill_substeps,
        distill_time_shift=args.distill_time_shift,
        distill_input_noise=args.distill_input_noise,
        distill_lr=(None if args.distill_lr is not None
                    and args.distill_lr < 0 else args.distill_lr),
        distill_loss_weight=args.distill_loss_weight,
        distill_guidance=args.distill_guidance,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_grad_norm=args.max_grad_norm,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        num_workers=args.num_workers,
        prefetch_depth=args.prefetch_depth,
        **({"frame_interval": args.frame_interval}
           if args.frame_interval is not None else {}),
        **({"max_input_length_limit": args.max_input_length_limit}
           if args.max_input_length_limit is not None else {}),
    )
    vae_cfg = VAEConfig.tiny() if args.tiny_model else VAEConfig()
    vae_params = None
    init_params = None
    if args.vae_ckpt:
        from .models.vae import vae_params_from_diffusers
        from .utils.torch_import import load_reference_checkpoint
        vae_params = {"params": vae_params_from_diffusers(
            load_reference_checkpoint(args.vae_ckpt), vae_cfg)}
    if args.model_ckpt:
        from .utils.torch_import import (load_reference_checkpoint,
                                         videogpt_params_from_torch)
        mc = _model_cfg(args)
        init_params = {"params": videogpt_params_from_torch(
            load_reference_checkpoint(args.model_ckpt), mc)}
        # torch checkpoints are standard fused layout; regroup for TP
        init_params = _convert_tp(init_params, mc, 1, mc.tensor_parallel)
    elif args.init_checkpoint_dir:
        # stage chaining: warm-start from a PRIOR stage's orbax checkpoint
        # (the reference's curriculum hands weights between stages,
        # train_x1_stage1_noiseinput.py:316-332). Partial restore of the
        # params only — never the previous stage's AdamW state.
        mc = _model_cfg(args)
        init_params, init_step = _restore_train_params(
            args.init_checkpoint_dir, mc, step=args.init_step,
            ema=args.init_ema, input_head=args.input_output_return)
        # cross-mesh chaining: the prior stage may have run at a different
        # tensor degree — convert between fused-column layouts
        init_params = _convert_tp(init_params, mc,
                                  _detect_ckpt_tp(args.init_checkpoint_dir),
                                  mc.tensor_parallel)
        print(f"warm-start from {args.init_checkpoint_dir} step {init_step}"
              f"{' (EMA)' if args.init_ema else ''}")

    writer = None
    if args.report_to == "tensorboard":
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join(args.results_dir,
                                                "tensorboard_log"))
        except Exception:
            pass
    mesh_cfg = None
    if args.mesh_data * args.mesh_seq * args.mesh_tensor * args.mesh_pipe \
            > 1:
        from .config import MeshConfig
        mesh_cfg = MeshConfig(data=args.mesh_data, seq=args.mesh_seq,
                              tensor=args.mesh_tensor, pipe=args.mesh_pipe,
                              zero_params=args.zero3)
    trainer = Trainer(
        _model_cfg(args), cfg, args.video_dir_path,
        vae_cfg=vae_cfg, vae_params=vae_params, init_params=init_params,
        target_resolution=tuple(args.target_resolution),
        mesh_cfg=mesh_cfg, seed=args.seed)
    steps = args.max_steps
    if args.epochs is not None:
        # reference drivers count EPOCHS over the dataset
        # (train_x1_stage1_noiseinput.py argparse); one step consumes
        # batch_size_per_device * mesh_data rows
        rows = max(1, trainer._batch_rows)
        steps = args.epochs * max(1, len(trainer.dataset) // rows)
        print(f"--epochs {args.epochs} => {steps} steps "
              f"({len(trainer.dataset)} clips, {rows} rows/step)")
    trainer.run(steps, log_writer=writer)


def _restore_train_params(checkpoint_dir, model_cfg, step=None, ema=False,
                          input_head=False, cast_dtype=None):
    """Restore the (EMA) params of an orbax training checkpoint.

    Shared by ``export`` and ``generate[-image] --checkpoint_dir`` so a
    training run feeds inference DIRECTLY (reference: train->infer is
    direct, EMA copy at train_x1_stage1:228,407) without a safetensors
    round-trip. Returns ``({"params": tree}, step)``; ``cast_dtype`` casts
    the floating leaves (the inference dtype) and logs the restore.
    """
    import jax
    import jax.numpy as jnp

    from .layout import RowSpec, build_layout
    from .models.video_gpt import Batch, VideoGPT
    from .utils import checkpoint as ckpt

    model = VideoGPT(model_cfg, dtype=jnp.float32, train_init=True,
                     input_head=input_head)
    lay = build_layout([RowSpec((1, 1), "training")], 4)
    z = jnp.zeros((2, 4, 4, model_cfg.in_channels))
    cl = jnp.zeros((1, 4, 4, model_cfg.in_channels))
    # PARTIAL restore against an ABSTRACT target: only the requested
    # params tree is read from disk and materialised (on HOST — callers
    # move it to the accelerator) — never the AdamW state, which is ~3x
    # the params bytes (~45G at 3.8B scale).
    params_abs = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), Batch.from_layout(lay), z,
                           jnp.zeros((2,)), cl))
    field = "ema_params" if ema else "params"
    cpu = jax.devices("cpu")[0]
    try:
        with jax.default_device(cpu):
            out, step = ckpt.restore_subtree(
                checkpoint_dir, {field: params_abs}, step=step)
    except FileNotFoundError:
        raise
    except Exception as e:
        hint = ("the checkpoint's structure does not match (--ema given but "
                "the run trained without EMA? wrong --step or model size? "
                "run trained with --input_output_return but no "
                "--input_head given?)")
        raise SystemExit(f"restore failed: {hint}\n  orbax: "
                         f"{type(e).__name__}: {str(e)[:200]}")
    tree = out[field]
    if tree is None:
        raise SystemExit("checkpoint has no EMA params; drop --ema")
    if cast_dtype is not None:
        tree = jax.tree.map(
            lambda x: x.astype(cast_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
    print(f"restored training checkpoint step {step}"
          f"{' (EMA)' if ema else ''} from {checkpoint_dir}")
    return tree, step


def _restore_lora_adapters(checkpoint_dir, model_cfg, rank, step=None,
                           ema=False, input_head=False):
    """Restore the ADAPTER tree of a ``train --use_lora`` run (its
    ``state.params`` IS the adapter tree — trainer.py LoRA branch)."""
    import jax
    import jax.numpy as jnp

    from .layout import RowSpec, build_layout
    from .models.video_gpt import Batch, VideoGPT
    from .training.lora import init_lora
    from .utils import checkpoint as ckpt

    model = VideoGPT(model_cfg, dtype=jnp.float32, train_init=True,
                     input_head=input_head)
    lay = build_layout([RowSpec((1, 1), "training")], 4)
    z = jnp.zeros((2, 4, 4, model_cfg.in_channels))
    cl = jnp.zeros((1, 4, 4, model_cfg.in_channels))
    lora_abs = jax.eval_shape(
        lambda: init_lora(
            jax.eval_shape(lambda: model.init(
                jax.random.PRNGKey(0), Batch.from_layout(lay), z,
                jnp.zeros((2,)), cl))["params"],
            rank, jax.random.PRNGKey(0)))
    field = "ema_params" if ema else "params"
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out, step = ckpt.restore_subtree(checkpoint_dir, {field: lora_abs},
                                         step=step)
    if out[field] is None:
        raise SystemExit("LoRA checkpoint has no EMA adapters; drop --ema")
    print(f"restored LoRA adapters (rank {rank}) step {step} from "
          f"{checkpoint_dir}")
    return out[field]


def cmd_generate(args):
    import cv2
    import jax
    import jax.numpy as jnp

    from .models.vae import AutoencoderKL, VAEConfig
    from .models.video_gpt import VideoGPT
    from .parallel.distributed import init_runtime
    from .sampling.pipeline import VideoGPTPipeline
    from .utils.cache import enable_compilation_cache

    init_runtime()  # multi-host serving: no-op without a coordinator env
    enable_compilation_cache()
    model_cfg = _model_cfg(args)
    mesh = None
    if args.mesh_seq * args.mesh_tensor > 1:
        # sequence/tensor-parallel serving over a Mesh (reference: inference
        # at SP=4, inference_nv.sh:23; TP is a TPU-native addition — heads/
        # MLP sharded over 'tensor'). Ulysses all_to_alls move only the tail
        from .config import MeshConfig
        from .parallel.mesh import make_mesh
        from dataclasses import replace as _dc_replace
        mesh = make_mesh(MeshConfig(data=1, seq=args.mesh_seq,
                                    tensor=args.mesh_tensor))
        if args.mesh_seq > 1:
            model_cfg = _dc_replace(model_cfg, seq_shard=True,
                                    sp_attention="ulysses")
    vae_cfg = VAEConfig.tiny() if args.tiny_model else VAEConfig()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = VideoGPT(model_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)

    if args.model_ckpt:
        from .utils.torch_import import (load_reference_checkpoint,
                                         resolve_checkpoint_path,
                                         videogpt_params_from_torch)
        if args.prediction_type is None and os.path.basename(
                resolve_checkpoint_path(args.model_ckpt)) == "model.pt":
            # reference driver: a model.pt checkpoint implies a
            # velocity-prediction model (inference driver:53-54)
            args.prediction_type = "v"
            print("model.pt checkpoint: prediction_type defaults to 'v'")
        params = {"params": videogpt_params_from_torch(
            load_reference_checkpoint(args.model_ckpt), model_cfg)}
        # torch checkpoints are standard fused layout; regroup for TP
        params = _convert_tp(params, model_cfg, 1, model_cfg.tensor_parallel)
    elif args.checkpoint_dir:
        # orbax training run -> inference directly (no export round-trip);
        # the run's fused-column layout is recorded in its train_args.json
        params, _ = _restore_train_params(
            args.checkpoint_dir, model_cfg, step=args.step, ema=args.ema,
            input_head=args.input_head, cast_dtype=dtype)
        params = _convert_tp(params, model_cfg,
                             _detect_ckpt_tp(args.checkpoint_dir),
                             model_cfg.tensor_parallel)
    else:
        params = None
    if args.prediction_type is None:
        args.prediction_type = "x1"
    if args.lora_checkpoint_dir:
        # inference-time LoRA merge (reference: LVMPipeline.merge_lora,
        # LVM/pipeline.py:97-101): adapters from a `train --use_lora` run
        # fold into the base kernels; the served model stays plain dense
        if params is None:
            raise SystemExit("--lora_checkpoint_dir needs base weights "
                             "(--model_ckpt or --checkpoint_dir)")
        from .training.lora import merge_lora
        lora = _restore_lora_adapters(
            args.lora_checkpoint_dir, model_cfg, rank=args.lora_rank,
            step=args.step, ema=args.ema, input_head=args.input_head)
        # adapters must be in the base's fused-column layout (lora_b of
        # qkv_proj is column-grouped under TP exactly like the kernel)
        lora = _convert_tp(lora, model_cfg,
                           _detect_ckpt_tp(args.lora_checkpoint_dir),
                           model_cfg.tensor_parallel)
        params = {"params": merge_lora(params["params"], lora)}
        params = jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    if args.vae_ckpt:
        from .models.vae import vae_params_from_diffusers
        from .utils.torch_import import load_reference_checkpoint
        vae_params = {"params": vae_params_from_diffusers(
            load_reference_checkpoint(args.vae_ckpt), vae_cfg)}
    else:
        vae_params = None

    # one video, or every video under --video_path_dir (reference driver
    # loops a directory, LVM/inference/...:74-105)
    if args.video_path_dir:
        from .data.video import list_videos
        video_paths = list_videos(args.video_path_dir)
        if not video_paths:
            raise SystemExit(f"no videos under {args.video_path_dir}")
    else:
        if not args.video_path:
            raise SystemExit("provide --video_path or --video_path_dir")
        video_paths = [args.video_path]

    def read_conditioning(path):
        # every 4th frame, like the reference driver (LVM/inference/...:84-87)
        cap = cv2.VideoCapture(path)
        frames = []
        for i in range(args.clean_image_num):
            cap.set(cv2.CAP_PROP_POS_FRAMES, i * 4)
            ok, f = cap.read()
            if not ok:
                raise SystemExit(f"cannot read frame {i * 4} of {path}")
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
        return frames

    frames = read_conditioning(video_paths[0])

    # random init fallback (smoke runs without a checkpoint)
    from .layout import frame_block_inference_layout, tokens_per_frame
    from .models.video_gpt import Batch
    from .data.processor import preprocess_frames
    px = preprocess_frames(frames, args.max_input_image_size)
    H, W = px.shape[1:3]
    f = vae_cfg.downsample_factor
    hl, wl = H // f, W // f
    if params is None:
        n = (hl // model_cfg.patch_size) * (wl // model_cfg.patch_size)
        lay = frame_block_inference_layout(len(frames), 1, n, use_cfg=True)
        z = jnp.zeros((2, hl, wl, model_cfg.in_channels), dtype)
        cl = jnp.zeros((len(frames), hl, wl, model_cfg.in_channels), dtype)
        params = model.init(jax.random.PRNGKey(0), Batch.from_layout(lay), z,
                            jnp.zeros((2,), dtype), cl)
        print("WARNING: no --model_ckpt; using random weights (smoke run)")
    if vae_params is None:
        vae_params = vae.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, H, W, 3), dtype),
                              jax.random.PRNGKey(2), True)
        print("WARNING: no --vae_ckpt; using random VAE weights")

    if mesh is not None and args.mesh_tensor > 1:
        # Megatron placement at rest: each tensor shard holds only its own
        # head/feature blocks (1/tp of qkv/o/gate_up/down weights)
        from .parallel.mesh import param_specs
        params = jax.device_put(params,
                                param_specs(params, mesh, tp=True))
    pipe = VideoGPTPipeline(model=model, params=params, vae=vae,
                            vae_params=vae_params, mesh=mesh)
    os.makedirs(args.save_dir, exist_ok=True)
    kw = dict(
        gen_nums=args.gen_nums,
        num_inference_steps=args.num_inference_steps,
        img_guidance_scale=args.img_guidance_scale,
        max_input_image_size=args.max_input_image_size,
        max_frame_window=args.max_frame_window,
        clean_image_noise_level=args.clean_image_noise_level,
        prediction_type=args.prediction_type,
        vae_roundtrip_recycle=args.vae_roundtrip_recycle,
        cfg_interval=(tuple(args.cfg_interval)
                      if args.cfg_interval else None),
        uncond_refresh=args.uncond_refresh,
    )

    def save(k, path, images):
        for i, im in enumerate(images):
            im.save(os.path.join(args.save_dir, f"{k}_{i}.png"))
        print(f"[{k}] {path}: saved {len(images)} frames to {args.save_dir}",
              flush=True)

    if len(video_paths) > 1:
        # same-bucket videos ride ONE B=N program set
        # (pipeline.generate_batch); the reference loops one at a time.
        # Preprocess ONCE per video — the arrays are both the bucket key
        # and the generate_batch input (preprocess_frames is idempotent).
        pre: dict = {}
        groups: dict = {}
        for path in video_paths:
            fr = frames if path == video_paths[0] else read_conditioning(path)
            arr = preprocess_frames(fr, args.max_input_image_size)
            pre[path] = arr
            groups.setdefault(arr.shape, []).append(path)
        order = {p: k for k, p in enumerate(video_paths)}
        for paths in groups.values():
            outs = pipe.generate_batch(
                [pre[p] for p in paths],
                seeds=[args.seed + order[p] for p in paths], **kw)
            for p, images in zip(paths, outs):
                save(order[p], p, images)
    else:
        images = pipe.generate(frames, seed=args.seed, **kw)
        save(0, video_paths[0], images)


def cmd_generate_image(args):
    """Single-shot text(+image) -> image (the OmniGen-ancestor family)."""
    import jax
    import jax.numpy as jnp

    from .image_gen import ImageGenPipeline, ImageGenProcessor
    from .models.vae import AutoencoderKL, VAEConfig
    from .models.video_gpt import VideoGPT
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model_cfg = _model_cfg(args)
    vae_cfg = VAEConfig.tiny() if args.tiny_model else VAEConfig()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = VideoGPT(model_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)

    if args.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    else:
        class _Stub:
            class _Out:
                def __init__(self, ids):
                    self.input_ids = ids

            def __call__(self, text):
                return self._Out([100 + (hash(w) % 1000)
                                  for w in text.split()])

        tokenizer = _Stub()
        print("WARNING: no --tokenizer; hashing words (smoke run only)")
    proc = ImageGenProcessor(tokenizer, args.max_input_image_size)

    if args.model_ckpt:
        from .utils.torch_import import (load_reference_checkpoint,
                                         videogpt_params_from_torch)
        params = {"params": videogpt_params_from_torch(
            load_reference_checkpoint(args.model_ckpt), model_cfg)}
    elif args.checkpoint_dir:
        params, _ = _restore_train_params(
            args.checkpoint_dir, model_cfg, step=args.step, ema=args.ema,
            cast_dtype=dtype)
        # a `train-image --mesh_tensor` run stores the TP-grouped fused
        # layout — convert to this (tp=1) model's standard layout, like
        # every other checkpoint-consuming command
        params = _convert_tp(params, model_cfg,
                             _detect_ckpt_tp(args.checkpoint_dir),
                             model_cfg.tensor_parallel)
    else:
        from .image_gen import TextRow, single_shot_layout
        from .models.video_gpt import Batch
        from .tokens import DEFAULT_TOKEN_IDS
        f = vae_cfg.downsample_factor
        hl, wl = args.height // f, args.width // f
        n = (hl // model_cfg.patch_size) * (wl // model_cfg.patch_size)
        # init with one input-image region so every submodule gets params
        row = TextRow([DEFAULT_TOKEN_IDS.slot] * n, [(0, n)])
        lay = single_shot_layout([row], n_out=n, n_region=n)
        params = model.init(
            jax.random.PRNGKey(0), Batch.from_layout(lay),
            jnp.zeros((1, hl, wl, model_cfg.in_channels), dtype),
            jnp.zeros((1,), dtype),
            jnp.zeros((1, hl, wl, model_cfg.in_channels), dtype))
        print("WARNING: no --model_ckpt; using random weights (smoke run)")
    if args.vae_ckpt:
        from .models.vae import vae_params_from_diffusers
        from .utils.torch_import import load_reference_checkpoint
        vae_params = {"params": vae_params_from_diffusers(
            load_reference_checkpoint(args.vae_ckpt), vae_cfg)}
    else:
        vae_params = vae.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, args.height, args.width, 3),
                                        dtype),
                              jax.random.PRNGKey(2), True)
        print("WARNING: no --vae_ckpt; using random VAE weights")

    pipe = ImageGenPipeline(model=model, params=params, vae=vae,
                            vae_params=vae_params, processor=proc)
    images = pipe(args.prompt, input_images=args.input_images or None,
                  height=args.height, width=args.width,
                  num_inference_steps=args.num_inference_steps,
                  guidance_scale=args.guidance_scale,
                  img_guidance_scale=args.img_guidance_scale,
                  max_input_image_size=args.max_input_image_size,
                  seed=args.seed,
                  separate_cfg_infer=not args.no_separate_cfg,
                  cfg_interval=(tuple(args.cfg_interval)
                                if args.cfg_interval else None),
                  uncond_refresh=args.uncond_refresh)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".",
                exist_ok=True)
    images[0].save(args.output)
    print(f"saved {args.output}")


def cmd_train_image(args):
    """Image-generation (OmniGen-ancestor) training: json dataset with
    condition dropout, velocity target (OmniGen/train_helper/data.py:19-110,
    loss.py:40-45)."""
    from .config import TrainConfig
    from .models.vae import VAEConfig
    from .parallel.distributed import init_runtime
    from .training.image_trainer import ImageGenTrainer
    from .utils.cache import enable_compilation_cache

    init_runtime()
    enable_compilation_cache()
    cfg = TrainConfig(
        batch_size_per_device=args.batch_size_per_device,
        lr=args.lr,
        results_dir=args.results_dir,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        mixed_precision=args.mixed_precision,
        use_ema=args.use_ema,
        auto_resume=not args.no_auto_resume,
        max_input_length_limit=args.max_input_length_limit,
        offload_optimizer=args.offload_optimizer,
        offload_grad_splits=args.offload_grad_splits,
        num_workers=args.num_workers,
        prefetch_depth=args.prefetch_depth,
    )
    vae_cfg = VAEConfig.tiny() if args.tiny_model else VAEConfig()
    vae_params = None
    if args.vae_ckpt:
        from .models.vae import vae_params_from_diffusers
        from .utils.torch_import import load_reference_checkpoint
        vae_params = {"params": vae_params_from_diffusers(
            load_reference_checkpoint(args.vae_ckpt), vae_cfg)}
    if args.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    else:
        class _Stub:
            class _Out:
                def __init__(self, ids):
                    self.input_ids = ids

            def __call__(self, text):
                return self._Out([100 + (hash(w) % 1000)
                                  for w in text.split()])

        tokenizer = _Stub()
        print("WARNING: no --tokenizer; hashing words (smoke run only)")
    writer = None
    if args.report_to == "tensorboard":
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join(args.results_dir,
                                                "tensorboard_log"))
        except Exception:
            pass
    mesh_cfg = None
    if args.mesh_data * args.mesh_seq * args.mesh_tensor > 1:
        from .config import MeshConfig
        mesh_cfg = MeshConfig(data=args.mesh_data, seq=args.mesh_seq,
                              tensor=args.mesh_tensor,
                              zero_params=args.zero3)
    trainer = ImageGenTrainer(
        _model_cfg(args), cfg, args.json_file, args.image_root, tokenizer,
        output_size=(args.height, args.width),
        input_size=((args.input_height, args.input_width)
                    if args.input_height else None),
        condition_dropout_prob=args.condition_dropout_prob,
        max_input_images=args.max_input_images,
        vae_cfg=vae_cfg, vae_params=vae_params, mesh_cfg=mesh_cfg,
        seed=args.seed)
    trainer.run(args.max_steps, log_writer=writer)


def cmd_export(args):
    """Export an orbax training checkpoint to the reference's safetensors
    layout (loadable by LVM.from_pretrained, LVM/model.py:196-211)."""
    from .utils.torch_export import save_safetensors

    cfg = _model_cfg(args)
    tree, step = _restore_train_params(args.checkpoint_dir, cfg,
                                       step=args.step, ema=args.ema,
                                       input_head=args.input_head)
    # safetensors exports are ALWAYS the standard fused layout (loadable by
    # the reference); undo a TP run's column grouping first
    tree = _convert_tp(tree, cfg, _detect_ckpt_tp(args.checkpoint_dir), 1)
    save_safetensors(tree, cfg, args.output)
    print(f"exported step {step}{' (EMA)' if args.ema else ''} "
          f"to {args.output}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("video_gpt_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="pretrain (stage 1-4 curriculum)")
    t.add_argument("--stage", type=int, default=1, choices=[1, 2, 3, 4])
    t.add_argument("--video_dir_path", type=str, required=True)
    t.add_argument("--results_dir", type=str, default="results")
    t.add_argument("--max_steps", type=int, default=1000)
    t.add_argument("--frame_num", type=int, default=None)
    t.add_argument("--batch_size_per_device", type=int, default=1)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--log_every", type=int, default=100)
    t.add_argument("--ckpt_every", type=int, default=1000)
    t.add_argument("--mixed_precision", default="bf16",
                   choices=["bf16", "no"])
    t.add_argument("--use_ema", action="store_true")
    t.add_argument("--use_lora", action="store_true")
    t.add_argument("--lora_rank", type=int, default=8)
    t.add_argument("--offload_optimizer", action="store_true",
                   help="host-offloaded AdamW: f32 master/mu/nu in "
                        "pinned_host, update as host compute — full-depth "
                        "3.8B training on ONE chip (the reference's "
                        "ZeRO-offload analogue)")
    t.add_argument("--offload_grad_splits", type=int, default=1,
                   help="backward passes per step (2 halves the live grad "
                        "accumulators in HBM for one forward recompute; "
                        "needed at 3.8B scale on a 16G chip)")
    t.add_argument("--distill", action="store_true",
                   help="progressive step-distillation (training/"
                        "distill.py): regress onto the frozen teacher's "
                        "multi-substep rollouts so the student serves at "
                        "--distill_student_steps Euler steps. Teacher = "
                        "the --init_checkpoint_dir/--model_ckpt weights; "
                        "the student starts from them")
    t.add_argument("--distill_student_steps", type=int, default=5,
                   help="sampler step count the student is trained for")
    t.add_argument("--distill_substeps", type=int, default=2,
                   help="teacher Euler substeps per student step (2 = the "
                        "classic halving round)")
    t.add_argument("--distill_time_shift", type=float, default=1.0,
                   help="sigma-grid time shift; must match the serving "
                        "scheduler's time_shifting_factor")
    t.add_argument("--distill_input_noise", type=float, default=1.0,
                   help="conditioning-frame noise floor during "
                        "distillation (1.0 = clean, the serving regime)")
    t.add_argument("--distill_lr", type=float, default=1e-4,
                   help="peak LR of the distillation optimizer (overrides "
                        "--lr; continue-from-teacher training needs ~10x "
                        "below the pretraining LR or Adam's scale-"
                        "invariant first step blasts the near-converged "
                        "student). Pass a negative value to inherit --lr")
    t.add_argument("--distill_loss_weight", default="uniform",
                   choices=["uniform", "endpoint"],
                   help="per-frame loss weighting across sigma-grid "
                        "points: 'endpoint' = ((s_next-s)/(1-s))^2, i.e. "
                        "MSE between landed endpoints, equalising "
                        "gradient scale across the grid")
    t.add_argument("--distill_guidance", type=float, default=None,
                   help="GUIDANCE distillation (arXiv:2210.03142): distill "
                        "the classifier-free-guided teacher uncond + w*"
                        "(cond - uncond) at this w into the student, which "
                        "then serves guidance-free (generate "
                        "--img_guidance_scale 1) — one forward per step, "
                        "no unconditional row. Set to the cfg_scale you "
                        "would have served with (reference: 1.5, "
                        "inference_nv.sh:34). Composes with step "
                        "distillation")
    t.add_argument("--cls_weight", type=float, default=None)
    t.add_argument("--input_output_return", action="store_true")
    t.add_argument("--input_noise", type=float, default=0.9)
    # optimisation knobs matching the reference drivers
    # (train_x1_stage1_noiseinput.py argparse)
    t.add_argument("--frame_interval", type=int, default=None,
                   help="frame stride (stage recipes default to 4)")
    t.add_argument("--lr_scheduler", default="constant_with_warmup",
                   choices=["constant", "constant_with_warmup", "cosine"])
    t.add_argument("--lr_warmup_steps", type=int, default=1000)
    t.add_argument("--gradient_accumulation_steps", type=int, default=1)
    t.add_argument("--max_grad_norm", type=float, default=1.0)
    t.add_argument("--adam_weight_decay", type=float, default=0.1)
    t.add_argument("--adam_epsilon", type=float, default=1e-8)
    t.add_argument("--adam_beta1", type=float, default=0.9)
    t.add_argument("--adam_beta2", type=float, default=0.95)
    t.add_argument("--epochs", type=int, default=None,
                   help="train for N passes over the dataset instead of "
                        "--max_steps (reference drivers count epochs)")
    t.add_argument("--num_workers", type=int, default=1,
                   help="batch-building worker threads (reference "
                        "DataLoader num_workers=4)")
    t.add_argument("--prefetch_depth", type=int, default=2,
                   help="prefetched batches held ahead of the device step")
    t.add_argument("--max_input_length_limit", type=int, default=None,
                   help="override the stage recipe's sequence budget")
    t.add_argument("--no_auto_resume", action="store_true")
    t.add_argument("--model_ckpt", type=str, default=None,
                   help="reference-format torch/safetensors initial weights")
    t.add_argument("--init_checkpoint_dir", type=str, default=None,
                   help="warm-start params from a prior stage's orbax "
                        "checkpoint dir (stage chaining; params only, "
                        "optimizer state starts fresh)")
    t.add_argument("--init_ema", action="store_true",
                   help="warm-start from the EMA params of "
                        "--init_checkpoint_dir")
    t.add_argument("--init_step", type=int, default=None,
                   help="checkpoint step for --init_checkpoint_dir "
                        "(default: latest)")
    t.add_argument("--vae_ckpt", type=str, default=None)
    t.add_argument("--target_resolution", type=int, nargs=2,
                   default=[176, 320])
    t.add_argument("--report_to", default="tensorboard")
    t.add_argument("--zero3", action="store_true",
                   help="ZeRO-3: shard params/EMA over the data axis at "
                        "rest (GSPMD inserts the per-use all-gathers), the "
                        "TPU form of the reference's DeepSpeed stage-3 "
                        "configs")
    t.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel mesh axis (batch rows + ZeRO "
                        "optimizer-state sharding)")
    t.add_argument("--mesh_seq", type=int, default=1,
                   help="sequence-parallel mesh axis (Ulysses shard_map "
                        "attention)")
    t.add_argument("--mesh_tensor", type=int, default=1,
                   help="Megatron tensor-parallel mesh axis: heads/MLP "
                        "features sharded over 'tensor' (a TPU-native "
                        "addition; the reference has no TP)")
    t.add_argument("--mesh_pipe", type=int, default=1,
                   help="GPipe pipeline-parallel mesh axis: the layer "
                        "stack staged over 'pipe', microbatches flowing "
                        "over ppermute (composes with --mesh_data)")
    t.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per step when --mesh_pipe > 1 "
                        "(0 = pipe degree; more shrinks the bubble)")
    t.add_argument("--sp_attention", default="ulysses",
                   choices=["ulysses", "ring"],
                   help="SP mechanism when --mesh_seq > 1: Ulysses "
                        "all-to-all (reference parity) or blockwise ring "
                        "(SP degree not capped by head count)")
    t.add_argument("--tiny_model", action="store_true",
                   help="tiny config for smoke tests")
    t.add_argument("--seed", type=int, default=0)
    t.set_defaults(func=cmd_train)

    g = sub.add_parser("generate",
                       help="autoregressive next-clip prediction")
    g.add_argument("--video_path", type=str, default=None)
    g.add_argument("--video_path_dir", type=str, default=None,
                   help="run every video in a directory "
                        "(reference driver behaviour)")
    g.add_argument("--save_dir", type=str, default="result/test/inference")
    g.add_argument("--model_ckpt", type=str, default=None,
                   help="reference-format torch/safetensors checkpoint")
    g.add_argument("--checkpoint_dir", type=str, default=None,
                   help="orbax training checkpoint dir (direct train->infer)")
    g.add_argument("--step", type=int, default=None,
                   help="orbax checkpoint step (default: latest)")
    g.add_argument("--ema", action="store_true",
                   help="use the EMA weights from --checkpoint_dir")
    g.add_argument("--lora_checkpoint_dir", type=str, default=None,
                   help="orbax checkpoints of a `train --use_lora` run; "
                        "adapters merge into the base weights at load "
                        "(reference merge_lora, LVM/pipeline.py:97-101)")
    g.add_argument("--lora_rank", type=int, default=8,
                   help="rank the LoRA run trained with")
    g.add_argument("--input_head", action="store_true",
                   help="checkpoint was trained with --input_output_return")
    g.add_argument("--vae_ckpt", type=str, default=None)
    g.add_argument("--clean_image_num", type=int, default=1)
    g.add_argument("--gen_nums", type=int, nargs="+", default=[4, 4])
    g.add_argument("--num_inference_steps", type=int, default=50)
    g.add_argument("--img_guidance_scale", type=float, default=1.0)
    g.add_argument("--max_input_image_size", type=int, default=320)
    g.add_argument("--max_frame_window", type=int, default=16)
    g.add_argument("--clean_image_noise_level", type=float, default=0.1)
    g.add_argument("--vae_roundtrip_recycle", action="store_true",
                   help="reference parity: VAE-decode+re-encode recycled "
                        "predictions (LVM/pipeline.py:491-498); default "
                        "feeds latents back directly")
    g.add_argument("--prediction_type", default=None, choices=["x1", "v"],
                   help="default: x1, or v when --model_ckpt resolves to a "
                        "model.pt (reference inference driver:53-54)")
    g.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="apply guidance only where sigma in [LO, HI); "
                        "skips the uncond forward elsewhere (arXiv:"
                        "2404.07724). Default: guidance at every step")
    g.add_argument("--uncond_refresh", type=int, default=1,
                   help="evaluate the uncond context only every k-th guided "
                        "step, reusing the cached uncond prediction in "
                        "between (DeepCache-style, arXiv:2312.00858). "
                        "Default 1: evaluate every guided step (reference "
                        "semantics); drift: scripts/cfg_drift.py")
    g.add_argument("--mesh_seq", type=int, default=1,
                   help="sequence-parallel serving over this many devices "
                        "(Ulysses; reference inference uses SP=4)")
    g.add_argument("--mesh_tensor", type=int, default=1,
                   help="tensor-parallel serving: heads/MLP features (and "
                        "the KV cache at rest) sharded over this many "
                        "devices; composes with --mesh_seq")
    g.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    g.add_argument("--tiny_model", action="store_true")
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(func=cmd_generate)

    gi = sub.add_parser("generate-image",
                        help="single-shot text(+image)->image generation")
    gi.add_argument("--prompt", type=str, required=True)
    gi.add_argument("--input_images", type=str, nargs="*", default=None)
    gi.add_argument("--output", type=str, default="result/image.png")
    gi.add_argument("--height", type=int, default=1024)
    gi.add_argument("--width", type=int, default=1024)
    gi.add_argument("--num_inference_steps", type=int, default=50)
    gi.add_argument("--guidance_scale", type=float, default=3.0)
    gi.add_argument("--img_guidance_scale", type=float, default=1.6)
    gi.add_argument("--max_input_image_size", type=int, default=1024)
    gi.add_argument("--model_ckpt", type=str, default=None,
                    help="reference-format torch/safetensors checkpoint")
    gi.add_argument("--checkpoint_dir", type=str, default=None,
                    help="orbax training checkpoint dir (e.g. a train-image "
                         "run) — direct train->infer")
    gi.add_argument("--step", type=int, default=None)
    gi.add_argument("--ema", action="store_true",
                    help="use the EMA weights from --checkpoint_dir")
    gi.add_argument("--vae_ckpt", type=str, default=None)
    gi.add_argument("--tokenizer", type=str, default=None,
                    help="HF tokenizer path for text prompts")
    gi.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    gi.add_argument("--tiny_model", action="store_true")
    gi.add_argument("--no_separate_cfg", action="store_true",
                    help="run the CFG contexts as one padded batch instead "
                         "of separately at natural lengths (the reference "
                         "default is separate, OmniGen/pipeline.py:147)")
    gi.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="apply guidance only where sigma in [LO, HI); "
                         "guidance contexts are skipped elsewhere "
                         "(arXiv:2404.07724)")
    gi.add_argument("--uncond_refresh", type=int, default=1,
                    help="evaluate the guidance contexts only every k-th "
                         "guided step, reusing their cached predictions in "
                         "between (arXiv:2312.00858); 1 = every step")
    gi.add_argument("--seed", type=int, default=None)
    gi.set_defaults(func=cmd_generate_image)

    ti = sub.add_parser("train-image",
                        help="image-generation training (json dataset + "
                             "condition dropout, velocity target)")
    ti.add_argument("--json_file", type=str, required=True,
                    help="json/jsonl with instruction/input_images/"
                         "output_image records")
    ti.add_argument("--image_root", type=str, default=None)
    ti.add_argument("--tokenizer", type=str, default=None)
    ti.add_argument("--height", type=int, default=512)
    ti.add_argument("--width", type=int, default=512)
    ti.add_argument("--input_height", type=int, default=None)
    ti.add_argument("--input_width", type=int, default=None)
    ti.add_argument("--condition_dropout_prob", type=float, default=0.1)
    ti.add_argument("--max_input_images", type=int, default=3)
    ti.add_argument("--max_input_length_limit", type=int, default=18000)
    ti.add_argument("--batch_size_per_device", type=int, default=1)
    ti.add_argument("--lr", type=float, default=1e-4)
    ti.add_argument("--max_steps", type=int, default=100000)
    ti.add_argument("--num_workers", type=int, default=1,
                    help="batch-building worker threads")
    ti.add_argument("--prefetch_depth", type=int, default=2)
    ti.add_argument("--results_dir", type=str, default="results_image")
    ti.add_argument("--log_every", type=int, default=100)
    ti.add_argument("--ckpt_every", type=int, default=1000)
    ti.add_argument("--mixed_precision", default="bf16",
                    choices=["bf16", "no"])
    ti.add_argument("--use_ema", action="store_true")
    ti.add_argument("--offload_optimizer", action="store_true",
                    help="host-offloaded AdamW (see `train`)")
    ti.add_argument("--offload_grad_splits", type=int, default=1)
    ti.add_argument("--no_auto_resume", action="store_true")
    ti.add_argument("--vae_ckpt", type=str, default=None)
    ti.add_argument("--zero3", action="store_true",
                    help="ZeRO-3: shard params/EMA over the data axis")
    ti.add_argument("--mesh_data", type=int, default=1,
                    help="data-parallel mesh axis (batch rows + ZeRO)")
    ti.add_argument("--mesh_seq", type=int, default=1,
                    help="sequence-parallel mesh axis")
    ti.add_argument("--mesh_tensor", type=int, default=1,
                    help="Megatron tensor-parallel mesh axis")
    ti.add_argument("--tiny_model", action="store_true")
    ti.add_argument("--report_to", default="none",
                    choices=["none", "tensorboard"])
    ti.add_argument("--seed", type=int, default=0)
    ti.set_defaults(func=cmd_train_image)

    e = sub.add_parser("export", help="orbax checkpoint -> reference-format "
                                      "safetensors")
    e.add_argument("--checkpoint_dir", type=str, required=True)
    e.add_argument("--output", type=str, default="model.safetensors")
    e.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    e.add_argument("--ema", action="store_true",
                   help="export the EMA weights")
    e.add_argument("--input_head", action="store_true",
                   help="checkpoint was trained with --input_output_return")
    e.add_argument("--tiny_model", action="store_true")
    e.set_defaults(func=cmd_export)
    return p


def main():
    args = build_parser().parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
