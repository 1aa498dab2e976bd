"""Test configuration: force CPU with a virtual 8-device mesh.

Tests must run without TPU hardware; multi-chip sharding is validated on
XLA's host-platform virtual devices (SURVEY.md §4 point 3).

NOTE (this image): sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and *claims the single TPU chip exclusively*, which
serializes concurrent python processes. For fast test runs invoke pytest as:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q

This conftest still forces the CPU backend either way (jax may already be
imported by sitecustomize, so both the env var and the config flag are set).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def icosphere():
    """A small watertight test mesh (subdivided icosahedron, radius 1)."""
    from tests.meshes import make_icosphere
    return make_icosphere(subdivisions=2)


@pytest.fixture(scope="session")
def cube_mesh():
    from tests.meshes import make_cube
    return make_cube()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
