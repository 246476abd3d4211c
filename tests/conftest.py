"""Test configuration.

Forces JAX onto an 8-device virtual CPU platform (SURVEY.md section 4 item 5)
so sharding/pjit tests run without real multi-chip hardware. The axon
sitecustomize registers the TPU backend at interpreter startup; overriding
``jax_platforms`` via jax.config BEFORE any backend is initialized redirects
everything to CPU. Set RNET_TEST_TPU=1 to run the suite on the real chip.
"""

import os
import sys

if not os.environ.get("RNET_TEST_TPU"):
    # virtual multi-device CPU platform (never leak this into the TPU
    # compile helper — it breaks remote compilation)
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

if not os.environ.get("RNET_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # fp32 tolerance tests need true fp32 matmuls on the MXU (default TPU
    # fp32 uses multi-pass bf16 with looser error bounds)
    jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Session-scoped synthetic CLEVR dataset."""
    from rnet.data import synth

    root = tmp_path_factory.mktemp("clevr_fixture")
    synth.generate(str(root), n_train=24, n_val=8, seed=0)
    return str(root)


@pytest.fixture(scope="session")
def dicts(fixture_dir):
    from rnet.data.vocab import build_dictionaries

    return build_dictionaries(fixture_dir)
