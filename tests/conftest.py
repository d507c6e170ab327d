"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated the standard JAX way — a virtual
device mesh on the host platform (the reference had no analogue; its
"tests" were runtime asserts, see SURVEY.md §4).
"""

import os
import sys
import types

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU
# plugin ('axon'), and its sitecustomize re-applies the platform via
# jax.config at interpreter start — env vars alone are NOT enough; the
# config must be updated after jax import, before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in xla_flags:
    # Raise XLA:CPU's 40 s collective-rendezvous watchdog: on this
    # 1-core host the 8 virtual device threads are routinely starved
    # past it, and the watchdog SIGABRTs the whole pytest session.
    xla_flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=900"
                  " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = xla_flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass
# Offline guards: never let transformers/HF touch the network in tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# NOTE: do NOT enable the persistent compilation cache for CPU tests.
# On this host, reloaded XLA:CPU AOT executables carry machine-feature
# flags the loader flags as mismatched; most reloads fail (silent
# recompile) and some load anyway and SIGILL/abort at execution
# (observed in test_dryrun_multichip_8). Fresh compiles only.

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def import_reference_module(name):
    """Import a module from the read-only reference tree for golden parity tests.

    Missing heavy deps (torchvision, pytorch_fid, skimage) are stubbed —
    the functions under test are pure torch/numpy math that never touch
    them. Returns None if the reference tree or torch is unavailable.
    """
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    if not os.path.isdir(REFERENCE_ROOT):
        return None

    for stub_name in [
        "torchvision", "torchvision.utils", "torchvision.transforms",
        "torchvision.models", "torchvision.models._utils",
        "skimage", "skimage.transform",
        "pytorch_fid", "pytorch_fid.fid_score",
        "pkg_resources",
        "timm", "timm.models", "timm.models.hub",
        "timm.models.vision_transformer", "timm.models.registry",
        "timm.models.layers", "timm.models.helpers",
        "fairscale", "fairscale.nn", "fairscale.nn.checkpoint",
        "fairscale.nn.checkpoint.checkpoint_activations",
        "selenium", "selenium.webdriver", "selenium.webdriver.chrome",
        "selenium.webdriver.chrome.options",
    ]:
        if stub_name not in sys.modules:
            mod = types.ModuleType(stub_name)
            # A real ModuleSpec so importlib.util.find_spec on the stub
            # (e.g. transformers' torchvision feature detection) works.
            import importlib.machinery

            mod.__spec__ = importlib.machinery.ModuleSpec(stub_name, loader=None)
            if stub_name == "pytorch_fid.fid_score":
                mod.calculate_frechet_distance = None
            if stub_name == "timm.models.hub":
                mod.download_cached_file = None
            if stub_name == "timm.models.vision_transformer":
                import torch as _torch

                mod._cfg = lambda **kw: kw
                mod.PatchEmbed = _torch.nn.Module
            if stub_name == "timm.models.registry":
                mod.register_model = lambda fn: fn
            if stub_name == "timm.models.layers":
                import torch as _torch

                mod.trunc_normal_ = _torch.nn.init.trunc_normal_
                mod.DropPath = _torch.nn.Identity
            if stub_name == "timm.models.helpers":
                mod.named_apply = None
                mod.adapt_input_conv = None
            if stub_name == "fairscale.nn.checkpoint.checkpoint_activations":
                mod.checkpoint_wrapper = lambda m, *a, **k: m
            if stub_name == "selenium.webdriver":
                mod.Chrome = None  # generate_util.py:33 `from selenium.webdriver import Chrome`
            if stub_name == "selenium.webdriver.chrome.options":
                mod.Options = object
            if stub_name == "pkg_resources":
                from packaging.version import parse as _parse_version

                mod.parse_version = _parse_version
            sys.modules[stub_name] = mod

    # transformers >= 4.3x moved these helpers (imported by the reference's
    # training/med.py:42-46) from modeling_utils to pytorch_utils; alias
    # them back so the reference imports under the installed version.
    try:
        from transformers import modeling_utils as _mu, pytorch_utils as _pu

        for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                   "prune_linear_layer"):
            if not hasattr(_mu, fn):
                setattr(_mu, fn, getattr(_pu, fn))
    except Exception:
        pass

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import importlib

    try:
        return importlib.import_module(name)
    except Exception:
        return None
