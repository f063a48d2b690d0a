"""Token-id conventions and token-kind enum for sequence layouts.

The reference builds sequences by running a HF tokenizer over prompt templates
like ``<img><|image_1|></img>`` / ``<|diffusion|><|image_2|>`` and inserting
0-placeholders for image patches (LVM/processor.py:128-179). Every structural
marker is a single added special token, so the video path needs no general
tokenizer at all — just four ids. They are configurable so that checkpoints
imported from the reference line up with its tokenizer's added-token ids.
"""
from __future__ import annotations

import dataclasses
import enum


class Kind(enum.IntEnum):
    """Per-token kind. Order matters: NOISY roles are (kind - DIFF)."""

    PAD = 0
    # noisy-frame segment: [DIFF, TIME, NOISY_IMG * n]
    DIFF = 1        # <|diffusion|> marker          (visibility role 0)
    TIME = 2        # timestep-embedding slot        (visibility role 1)
    NOISY_IMG = 3   # latent patch being denoised    (visibility role 2)
    # clean-frame segment: [IMG_OPEN, CLEAN_IMG * n, IMG_CLOSE]
    IMG_OPEN = 4    # <img>
    CLEAN_IMG = 5   # conditioning latent patch
    IMG_CLOSE = 6   # </img>
    # free text (OmniGen image-generation path prompts)
    TEXT = 7


@dataclasses.dataclass(frozen=True)
class TokenIds:
    """Vocabulary ids for the structural tokens.

    ``slot`` is the placeholder id written at positions whose embedding is
    replaced (image patches, time token) — the reference uses 0
    (LVM/processor.py:124,169). ``pad`` mirrors LVMCollator's default
    pad_token_id=2 (LVM/processor.py:427).
    """

    pad: int = 2
    slot: int = 0
    img_open: int = 32002
    img_close: int = 32003
    diffusion: int = 32004

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "TokenIds":
        """Derive the structural ids from a real checkpoint tokenizer
        (the reference never hard-codes ids — ``<img>``/``</img>``/
        ``<|diffusion|>`` are added tokens of the shipped tokenizer,
        LVM/processor.py:76). The class defaults are only a smoke-run
        assumption; any real checkpoint should go through here."""
        def tid(tok, default):
            try:
                t = tokenizer.convert_tokens_to_ids(tok)
                unk = getattr(tokenizer, "unk_token_id", None)
                if t is None or t < 0 or (unk is not None and t == unk):
                    return default
                return int(t)
            except Exception:
                return default

        pad = getattr(tokenizer, "pad_token_id", None)
        return cls(
            pad=int(pad) if pad is not None else cls.pad,
            slot=cls.slot,
            img_open=tid("<img>", cls.img_open),
            img_close=tid("</img>", cls.img_close),
            diffusion=tid("<|diffusion|>", cls.diffusion),
        )


DEFAULT_TOKEN_IDS = TokenIds()
