"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding tests run on a virtual CPU mesh (the TPU-world analogue of
a fake backend — SURVEY.md §4): 8 host devices via XLA_FLAGS, platform pinned
to CPU so tests never contend for the single real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's axon (TPU tunnel) plugin registers itself from
# sitecustomize and ignores JAX_PLATFORMS; pin the platform via the config so
# tests run on the virtual 8-device CPU mesh, never the real chip.
jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from tests.fixtures.mrt import write_synthetic_corpus  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_corpus(tmp_path_factory):
    """A tiny synthetic ICSI-style corpus: transcripts + known ground truth."""
    root = tmp_path_factory.mktemp("icsi")
    return write_synthetic_corpus(root)


@pytest.fixture()
def rng():
    """Fresh seeded generator PER TEST: adding or reordering tests must
    never shift the random stream another test consumes (a session-scoped
    generator made borderline assertions flake when new tests landed)."""
    return np.random.default_rng(23)
