"""VideoGPT: DiT-over-Phi3 next-clip diffusion model.

TPU-native re-design of LVM/model.py (LVM / LVMTraining / LVMTraining_CP —
one module covers all three: parallelism lives outside the model, and the
train-specific init is a flag). The reference assembles its embedding
sequence with Python loops over dict indices (LVM/model.py:436-454); here the
layout's precomputed gather maps do it with three vectorised selects, so the
whole forward is a single jittable function.

Forward variants:
- ``__call__``: full-sequence forward (training + uncached inference).
- ``prefill``: run the clean-context prefix once, return the KV cache.
- ``decode``: one denoise evaluation over only the noisy tail against the
  cached prefix — the fast path the reference disabled (LVM/scheduler.py:174,
  restoring OmniGen/scheduler.py:155-176 semantics).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.attention import AttnMeta
from .embedders import (FinalLayer, PatchEmbed, TimestepEmbedder,
                        crop_pos_embed, sincos_2d_pos_embed, unpatchify)
from .phi3 import KVCache, Phi3Decoder


class Batch(NamedTuple):
    """Device-side view of a SequenceLayout (all jnp int32)."""

    input_ids: jax.Array    # [B, L]
    pos_ids: jax.Array      # [B, L]
    noisy_src: jax.Array    # [B, L] -> [Nn*n] or -1
    clean_src: jax.Array    # [B, L] -> [Nc*n] or -1
    time_src: jax.Array     # [B, L] -> [Nn] or -1
    noisy_gather: jax.Array  # [Nn, n] flat b*L+pos
    clean_gather: jax.Array  # [Nc, n]
    meta: AttnMeta

    @classmethod
    def from_layout(cls, layout) -> "Batch":
        return cls(
            input_ids=jnp.asarray(layout.input_ids),
            pos_ids=jnp.asarray(layout.pos_ids),
            noisy_src=jnp.asarray(layout.noisy_src),
            clean_src=jnp.asarray(layout.clean_src),
            time_src=jnp.asarray(layout.time_src),
            noisy_gather=jnp.asarray(layout.noisy_gather),
            clean_gather=jnp.asarray(layout.clean_gather),
            meta=AttnMeta.from_layout(layout),
        )


def maybe_bias(cfg: ModelConfig, q_meta: AttnMeta, k_meta: AttnMeta):
    """Precompute the (layer- and step-invariant) attention bias when the
    flash fast path will consume it and it fits the size/VMEM budgets.
    Callers that loop (the sampler's scan) should compute this ONCE and pass
    it to ``decode`` rather than paying the evaluation per step."""
    import jax as _jax
    if cfg.attn_impl not in ("auto", "pallas"):
        return None
    if cfg.sp_attention in ("ulysses", "ring"):
        # collective SP evaluates the mask from O(L) metadata in-kernel:
        # the wrappers can then pad awkward lengths to the seq multiple
        # themselves (a precomputed dense bias cannot be padded
        # consistently after the fact). GSPMD-only seq_shard keeps the
        # bias fast path.
        return None
    if _jax.default_backend() != "tpu":
        return None
    b, lq = q_meta.index.shape
    lk = k_meta.vis_start.shape[1]
    if b * lq * lk > cfg.precompute_bias_limit:
        return None
    if lk > 8192:  # == round_up(lk, 128) > 8192, the resident-kernel cap
        # beyond the resident kernels' key cap only the k-STREAMING kernels
        # apply, and their bias flavour is wrong for training: the bias is a
        # custom-vjp residual, so nn.scan stacks one copy PER LAYER (12G at
        # 14k tokens). The metadata-inline streaming pair evaluates the mask
        # in-kernel from O(L) vectors instead — fwd and bwd.
        return None
    from ..ops.flash_attention import precompute_bias
    return precompute_bias(q_meta, k_meta)


def decode_mask(q_meta: AttnMeta, k_meta: AttnMeta):
    """Columnar decode mask (jnp mirror of ``layout.decode_rank``; the
    host-side predicate there must have validated the layout first). O(L)
    metadata instead of an O(Lq*Lk) bias — the decode kernel evaluates
    ``q_offset >= rank`` per element with zero bias HBM traffic."""
    from ..ops.flash_attention import DecodeMask
    first_q = k_meta.vis_start.shape[1] - q_meta.q_offset.shape[1]
    g = q_meta.q_block[:, -1:]
    nb = k_meta.noisy_block
    rank = jnp.where((nb >= 0) & (nb == g), k_meta.noisy_role,
                     jnp.where(k_meta.vis_start <= first_q, -1, 2**30))
    return DecodeMask(rank=rank.astype(jnp.int32), q_off=q_meta.q_offset)


def extend_mask(q_meta: AttnMeta, k_meta: AttnMeta):
    """Columnar mask for the cache-extend step.

    Extend queries are CLEAN tokens (the clean copies of the previous
    block's predictions — extend_cache's contract), so the noisy term of
    the general visibility rule (``noisy_block[k] == q_block[q] >= 0``) is
    identically false (clean queries carry ``q_block = -1``) and the rule
    collapses EXACTLY, for any keys, to ``q_index >= vis_start[k]`` — the
    columnar ``q_off >= rank`` form the decode kernels evaluate. This
    routes extend through the split decode kernel (~3x the inline rule's
    throughput at extend shapes: 29 -> ~9 ms/layer measured on v5e) and
    removes the per-layer cache concat."""
    from ..ops.flash_attention import DecodeMask
    return DecodeMask(rank=k_meta.vis_start.astype(jnp.int32),
                      q_off=q_meta.index.astype(jnp.int32))


def _scatter(emb: jax.Array, src: jax.Array, values: jax.Array) -> jax.Array:
    """Replace emb[b, l] with values[src[b, l]] where src >= 0.
    ``values`` may be [N, n, D] (flattened here) or already flat [M, D]."""
    flat = values.reshape(-1, values.shape[-1])
    taken = jnp.take(flat, jnp.clip(src, 0), axis=0)
    return jnp.where((src >= 0)[..., None], taken.astype(emb.dtype), emb)


def _has_frames(clean) -> bool:
    if clean is None:
        return False
    if isinstance(clean, (tuple, list)):
        return any(g.shape[0] > 0 for g in clean)
    return clean.shape[0] > 0


class VideoGPT(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    train_init: bool = False   # zero-init x_embedder (LVM/model.py:639)
    input_head: bool = False   # aux input-reconstruction head
                               # (LVM/model.py:668-675)

    def setup(self):
        cfg = self.cfg
        self._pos_table = sincos_2d_pos_embed(
            cfg.hidden_size, cfg.pos_embed_max_size,
            interpolation_scale=cfg.pe_interpolation, base_size=64)
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="embed_tokens")
        self.x_embedder = PatchEmbed(cfg.hidden_size, cfg.patch_size,
                                     self.dtype, zero_init=self.train_init,
                                     name="x_embedder")
        self.input_x_embedder = PatchEmbed(cfg.hidden_size, cfg.patch_size,
                                           self.dtype,
                                           name="input_x_embedder")
        self.time_token = TimestepEmbedder(cfg.hidden_size,
                                           cfg.freq_embed_size, self.dtype,
                                           name="time_token")
        self.t_embedder = TimestepEmbedder(cfg.hidden_size,
                                           cfg.freq_embed_size, self.dtype,
                                           name="t_embedder")
        self.final_layer = FinalLayer(cfg.patch_size, cfg.in_channels,
                                      self.dtype, name="final_layer")
        if self.input_head:
            self.input_final_layer = nn.Dense(
                cfg.patch_size ** 2 * cfg.in_channels, dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="input_final_layer")
        self.llm = Phi3Decoder(cfg, self.dtype, name="llm")

    # ---- embedding assembly ------------------------------------------------

    def _pos_embed(self, hl: int, wl: int) -> jax.Array:
        p = self.cfg.patch_size
        table = crop_pos_embed(self._pos_table, self.cfg.pos_embed_max_size,
                               hl // p, wl // p)
        return jnp.asarray(table, self.dtype)

    def _embed_frames(self, latents: jax.Array, is_input: bool) -> jax.Array:
        """[N, hl, wl, C] -> [N, n_img, D] with 2D sincos position bias."""
        embedder = self.input_x_embedder if is_input else self.x_embedder
        tok = embedder(latents)
        return tok + self._pos_embed(latents.shape[1], latents.shape[2])[None]

    def _embed_clean_flat(self, clean) -> jax.Array:
        """Clean conditions as a FLAT [sum_i Ni*ni, D] patch stream.

        ``clean`` is one [N, hl, wl, C] array (the video path: all frames
        share a geometry) or a tuple/list of such arrays — heterogeneous
        input-image sizes in one image-gen prompt, each at its own token
        length (OmniGen/processor.py:83-91). ``clean_src`` gather indices
        address this stream in group order."""
        groups = clean if isinstance(clean, (tuple, list)) else (clean,)
        parts = [self._embed_frames(g, is_input=True) for g in groups
                 if g.shape[0] > 0]
        flat = [p.reshape(-1, p.shape[-1]) for p in parts]
        return flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=0)

    def _assemble(self, ids, noisy_src, clean_src, time_src,
                  noisy_latents, t, clean_latents):
        emb = self.embed_tokens(ids)
        if self.cfg.seq_shard or self.cfg.tensor_parallel > 1:
            # Pin the token stream to the activation layout (data, seq, ·)
            # at the embed gather and each scatter, and the VALUE streams
            # to replicated: every (data, seq) shard takes arbitrary value
            # rows, and without the anchors GSPMD's ZeRO-3 propagation
            # offers the values feature-sharded over 'data' and falls back
            # to "involuntary full rematerialization" (replicate +
            # repartition per step) on the takes — observed on the (2,2,2)
            # dp x sp x tp dryrun (MULTICHIP_r04).
            from ..parallel.mesh import (constrain_activations,
                                         constrain_replicated)
        else:
            constrain_activations = constrain_replicated = lambda x: x
        emb = constrain_activations(emb)
        if noisy_latents is not None and noisy_latents.shape[0] > 0:
            x = constrain_replicated(
                self._embed_frames(noisy_latents, is_input=False))
            emb = constrain_activations(_scatter(emb, noisy_src, x))
            emb = constrain_activations(_scatter(
                emb, time_src, constrain_replicated(self.time_token(t))))
        if _has_frames(clean_latents):
            emb = constrain_activations(_scatter(
                emb, clean_src,
                constrain_replicated(self._embed_clean_flat(clean_latents))))
        return emb

    def _heads(self, hidden, gather, t, shape, aux=False):
        """Per-frame head: gather patch states, adaLN head, unpatchify."""
        n_frames, hl, wl = shape
        flat = hidden.reshape(-1, hidden.shape[-1])
        img = jnp.take(flat, gather.reshape(-1), axis=0)
        img = img.reshape(n_frames, -1, hidden.shape[-1])
        if aux:
            out = self.input_final_layer(img)
        else:
            out = self.final_layer(img, self.t_embedder(t))
        return unpatchify(out, hl, wl, self.cfg.patch_size,
                          self.cfg.in_channels)

    def _maybe_bias(self, q_meta: AttnMeta, k_meta: AttnMeta):
        return maybe_bias(self.cfg, q_meta, k_meta)

    # ---- forward variants --------------------------------------------------

    def __call__(self, batch: Batch, noisy_latents: jax.Array, t: jax.Array,
                 clean_latents: Optional[jax.Array] = None,
                 input_output_return: bool = False,
                 bias: Optional[jax.Array] = None):
        """Full-sequence forward. Returns x1-prediction per noisy frame
        [Nn, hl, wl, C] (+ optional clean-frame reconstruction). ``bias``
        lets loop callers (the sampler's scan) pay the step-invariant mask
        evaluation once, like :meth:`decode`."""
        emb = self._assemble(batch.input_ids, batch.noisy_src,
                             batch.clean_src, batch.time_src,
                             noisy_latents, t, clean_latents)
        if bias is None:
            bias = self._maybe_bias(batch.meta, batch.meta)
        hidden, _ = self.llm(emb, batch.pos_ids, batch.meta, batch.meta,
                             bias=bias)
        nn_, hl, wl, _ = noisy_latents.shape
        pred = self._heads(hidden, batch.noisy_gather, t, (nn_, hl, wl))
        if input_output_return:
            nc = clean_latents.shape[0]
            aux = self._heads(hidden, batch.clean_gather, None,
                              (nc, clean_latents.shape[1],
                               clean_latents.shape[2]), aux=True)
            return pred, aux
        return pred

    def prefill(self, batch: Batch, clean_latents: Optional[jax.Array],
                prefix_len: int) -> KVCache:
        """Run the clean-context prefix once; return per-layer K/V."""
        lp = prefix_len
        ids = batch.input_ids[:, :lp]
        emb = self.embed_tokens(ids)
        if _has_frames(clean_latents):
            emb = _scatter(emb, batch.clean_src[:, :lp],
                           self._embed_clean_flat(clean_latents))
        meta_p = AttnMeta(*(x[:, :lp] for x in batch.meta))
        _, cache = self.llm(emb, batch.pos_ids[:, :lp], meta_p, meta_p,
                            bias=self._maybe_bias(meta_p, meta_p))
        if self.cfg.seq_shard or self.cfg.tensor_parallel > 1:
            # at-rest head sharding (tensor-major x seq-minor): each shard
            # holds only its own heads' prefix keys
            from ..parallel.mesh import constrain_cache
            cache = constrain_cache(cache)
        return cache

    def extend_cache(self, batch: Batch, new_latents: jax.Array,
                     cache: KVCache, new_len: int,
                     n_prev_clean: int) -> KVCache:
        """Grow a clean-prefix cache by the segment tokens in
        ``batch.input_ids[:, old:old+new_len]`` (the clean copies of the
        previous block's predictions) instead of re-prefilling the whole
        prefix — the cross-block half of the OmniGen cache pattern
        (OmniGen/scheduler.py:155-176; the reference re-encodes the full
        prefix every block, LVM/pipeline.py:418-422).

        ``new_latents`` holds ONLY the appended frames; ``n_prev_clean`` is
        how many clean frames the existing cache already covers. Exact
        equality with a fresh prefill holds because clean positions always
        start at 0 and the layout is pad-free (B=1 separate-CFG row):
        verified in tests/test_kv_extend.py.
        """
        old = cache.length
        sl = slice(old, old + new_len)
        ids = batch.input_ids[:, sl]
        emb = self.embed_tokens(ids)
        c = self._embed_frames(new_latents, is_input=True)
        offset = n_prev_clean * (
            new_latents.shape[1] // self.cfg.patch_size
            * (new_latents.shape[2] // self.cfg.patch_size))
        src = batch.clean_src[:, sl]
        src = jnp.where(src >= offset, src - offset, -1)
        emb = _scatter(emb, src, c)
        q_meta = AttnMeta(*(x[:, sl] for x in batch.meta))
        k_meta = AttnMeta(*(x[:, :old + new_len] for x in batch.meta))
        _, new_kv = self.llm(emb, batch.pos_ids[:, sl], q_meta, k_meta,
                             cache=cache,
                             bias=extend_mask(q_meta, k_meta))
        # heads-major stacked cache [layers, B, H_kv, L, D]: append along L
        grown = KVCache(jnp.concatenate([cache.k, new_kv.k], axis=3),
                        jnp.concatenate([cache.v, new_kv.v], axis=3))
        if self.cfg.seq_shard or self.cfg.tensor_parallel > 1:
            from ..parallel.mesh import constrain_cache
            grown = constrain_cache(grown)
        return grown

    def decode(self, batch: Batch, noisy_latents: jax.Array, t: jax.Array,
               cache: KVCache, tail_len: int,
               bias: Optional[jax.Array] = None) -> jax.Array:
        """One denoise evaluation over the noisy tail against the cache."""
        lt = tail_len
        full_l = batch.input_ids.shape[1]
        ids = batch.input_ids[:, -lt:]
        emb = self.embed_tokens(ids)
        x = self._embed_frames(noisy_latents, is_input=False)
        # tail-local views of the gather maps
        noisy_src = batch.noisy_src[:, -lt:]
        time_src = batch.time_src[:, -lt:]
        emb = _scatter(emb, noisy_src, x)
        emb = _scatter(emb, time_src, self.time_token(t))
        q_meta = batch.meta.tail(lt)
        if bias is None:
            bias = self._maybe_bias(q_meta, batch.meta)
        hidden, _ = self.llm(emb, batch.pos_ids[:, -lt:], q_meta, batch.meta,
                             cache=cache, bias=bias)
        # remap full-sequence gather indices onto the tail
        g = batch.noisy_gather
        b_idx, pos = g // full_l, g % full_l
        g_tail = b_idx * lt + (pos - (full_l - lt))
        nn_, hl, wl, _ = noisy_latents.shape
        return self._heads(hidden, g_tail, t, (nn_, hl, wl))
