"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU runs happen via bench.py / the driver; unit tests must be
deterministic and runnable anywhere, and the multi-chip sharding tests need
several devices, so we force the host platform with 8 virtual devices before
JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The axon TPU plugin registers itself even under JAX_PLATFORMS=cpu; pin the
# default device to CPU so unit tests never dispatch through the TPU tunnel.
try:
    jax.config.update("jax_default_device", "cpu")
except Exception:
    pass

os.environ["VDA_PALLAS_INTERPRET"] = "1"

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from vda_tpu.config import EncoderConfig, ModelConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> ModelConfig:
    """A miniature model that exercises every architectural feature."""
    vit = EncoderConfig(embed_dim=64, depth=2, num_heads=2, img_size=56)
    return ModelConfig(
        encoder="tiny",
        features=32,
        out_channels=(32, 32, 32, 32),
        intermediate_layer_idx=(0, 0, 1, 1),
        vit=vit,
        num_frames=4,
    )


def has_torch():
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


requires_torch = pytest.mark.skipif(not has_torch(), reason="torch not available")
