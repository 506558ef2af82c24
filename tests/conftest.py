"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the TPU analog of a fake multi-chip backend: sharding/collective code
paths compile and run on 8 host devices (SURVEY.md §4 test plan)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Env vars alone don't always win over a pre-registered TPU PJRT plugin
# (this image tunnels a real chip); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def stub_reference_deps() -> None:
    """Stub modules the reference imports but this image lacks (torchvision).
    Only attribute access at import time needs to resolve."""
    import importlib.machinery
    import sys
    import types

    def _stub(name):
        m = types.ModuleType(name)
        # some importers probe via importlib.util.find_spec; a None __spec__
        # raises ValueError, so give stubs a real ModuleSpec
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        for sub in ("transforms", "datasets", "models", "utils"):
            m = _stub(f"torchvision.{sub}")
            setattr(tv, sub, m)
            sys.modules[f"torchvision.{sub}"] = m
        # instantiated (but unused for our flows) inside reference loops
        tv.transforms.ToPILImage = lambda *a, **k: (lambda x: x)
        for t in ("Compose", "ToTensor", "Normalize", "RandomHorizontalFlip",
                  "RandomVerticalFlip", "RandomAffine", "ColorJitter",
                  "CenterCrop", "Resize", "GaussianBlur"):
            setattr(tv.transforms, t, lambda *a, **k: (lambda x: x))
        sys.modules["torchvision"] = tv
    if "openslide" not in sys.modules:
        sys.modules["openslide"] = _stub("openslide")
    if "timm" not in sys.modules:
        sys.modules["timm"] = _stub("timm")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
