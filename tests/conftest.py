"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is first imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var route (JAX_PLATFORMS=cpu) is overridden by preinstalled device
# plugins in this image; the config update is honored.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def reference_available():
    return REFERENCE.exists()


def load_reference_module(relpath: str, name: str):
    """Import a module from the (read-only) reference checkout for parity
    tests, without adding the whole reference tree to sys.path."""
    import importlib
    import importlib.util

    path = REFERENCE / relpath
    if not path.exists():
        pytest.skip(f"reference module {relpath} not available")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    # The reference's package __init__ chain pulls heavy deps (hydra,
    # lightning, ...) this image doesn't ship; stub them out — parity tests
    # only touch pure torch/numpy math modules.
    from unittest.mock import MagicMock

    for stub in ("hydra", "hydra.utils", "hydra.core", "hydra.core.hydra_config",
                 "omegaconf", "lightning", "lightning.pytorch",
                 "lightning.pytorch.loggers", "lightning_utilities",
                 "lightning_utilities.core", "lightning_utilities.core.rank_zero",
                 "rootutils", "deeptime", "deeptime.decomposition",
                 "torchmetrics"):
        if stub not in sys.modules:
            try:
                importlib.import_module(stub)
            except ImportError:
                sys.modules[stub] = MagicMock(name=stub)
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def fixture_pdb() -> pathlib.Path:
    """Smallest in-repo test target (chignolin, 10 residues)."""
    p = REPO / "testdata" / "CLN025.pdb"
    if not p.exists():
        pytest.skip("test PDB fixture missing")
    return p


@pytest.fixture(scope="session")
def fixture_pdb_bpti() -> pathlib.Path:
    p = REPO / "testdata" / "bpti.pdb"
    if not p.exists():
        pytest.skip("test PDB fixture missing")
    return p
