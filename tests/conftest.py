"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference has no fake-backend story (SURVEY.md §4); here every test runs
on CPU with 8 virtual devices so mesh/sharding/collective semantics are
exercised without TPU hardware.

Set ASR_TPU_TESTS=1 to keep the hardware backend instead — this enables
the TPU-marked tests (tests/test_flash_attention_tpu.py) on the bench chip.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_USE_TPU = os.environ.get("ASR_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# the environment's sitecustomize may pre-import jax with a hardware platform
# pinned (jax_platforms="axon,cpu"); force CPU before any backend initializes
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
