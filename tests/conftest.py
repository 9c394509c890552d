"""test configuration: run JAX on a virtual 8-device CPU mesh in float64.

Multi-chip sharding is validated on forced host-platform devices (no TPU
hardware needed); float64 matches the reference's accuracy envelope.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS from the environment; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture()
def tmp_workdir(tmp_path):
    """per-test scratch workdir"""
    workdir = tmp_path / "workdir"
    workdir.mkdir()
    return str(workdir)
