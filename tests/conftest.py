"""Test harness config.

- Forces JAX onto CPU with 8 virtual devices so sequence/data-parallel tests
  run without TPU hardware (SURVEY.md §4).
- Provides a fixture that imports the reference implementation
  (/root/reference, read-only) as a test oracle. Missing heavyweight deps of
  the reference (torchvision, timm, diffusers, deepspeed) are stubbed with
  just enough surface for import; the oracle functions under test are pure
  torch/numpy host code.
"""
import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# this jax build ignores the JAX_PLATFORMS env var (the 'axon' TPU plugin
# wins regardless); only the config flag reliably forces the CPU backend
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REFERENCE_ROOT = "/root/reference"


def _stub_module(name, **attrs):
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def _install_reference_stubs():
    # torchvision: processor.py only uses transforms.Compose/Lambda/ToTensor/
    # Normalize inside LVMProcessor.__init__ (we never construct it).
    tv = _stub_module("torchvision")
    transforms = _stub_module("torchvision.transforms")

    class _Never:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub: not available in tests")

    for n in ("Compose", "Lambda", "ToTensor", "Normalize"):
        setattr(transforms, n, _Never)
    tv.transforms = transforms

    # huggingface_hub may exist; if not, stub snapshot_download.
    try:
        import huggingface_hub  # noqa: F401
    except Exception:
        _stub_module("huggingface_hub", snapshot_download=None)

    # deepspeed: imported at top of LVM/acceleration/parallel_states.py.
    _stub_module("deepspeed", init_distributed=lambda *a, **k: None)

    # timm: LVM/model.py imports PatchEmbed/Attention/Mlp but never uses them.
    _stub_module("timm")
    _stub_module("timm.models")
    _stub_module("timm.models.vision_transformer",
                 PatchEmbed=object, Attention=object, Mlp=object)

    # diffusers: LVM/model.py mixes in PeftAdapterMixin (unused in tests).
    _stub_module("diffusers")
    _stub_module("diffusers.loaders", PeftAdapterMixin=object)
    _stub_module("diffusers.models", AutoencoderKL=object)
    du = _stub_module("diffusers.utils",
                      USE_PEFT_BACKEND=False,
                      is_torch_xla_available=lambda: False,
                      replace_example_docstring=lambda s: (lambda f: f),
                      scale_lora_layers=None, unscale_lora_layers=None)

    class _Logging:
        @staticmethod
        def get_logger(name):
            import logging
            return logging.getLogger(name)

    du.logging = _Logging()
    _stub_module("peft", LoraConfig=object, PeftModel=object)


@pytest.fixture(scope="session")
def ref():
    """Namespace of reference modules (oracle). Skips if torch is unusable."""
    pytest.importorskip("torch")
    _install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import LVM.processor as ref_processor  # noqa
    ns = types.SimpleNamespace(processor=ref_processor,
                               Collator=ref_processor.LVMCollator)
    return ns


@pytest.fixture(scope="session")
def ref_model_mod():
    """The reference LVM/model.py module (for embedder/pos-embed oracles)."""
    pytest.importorskip("torch")
    _install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import LVM.model as ref_model  # noqa
    return ref_model
