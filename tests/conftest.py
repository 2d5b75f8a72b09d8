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


# --------------------------------------------------------------------------- #
# Smoke tier: one fast test per subsystem, the pre-commit gate (the full
# suite is the round gate; it costs ~30 min on the 1-core build host).
# Run with:  python -m pytest -m smoke -q   (target: <=2 min)
# Centralised here so the tier is one auditable list, not scattered marks.
# --------------------------------------------------------------------------- #

_SMOKE_NODE_IDS = {
    # fbank featurizer vs analytic oracle
    "tests/test_fbank.py::test_matches_oracle",
    # model zoo: twin differential (always) + literal reference oracle (gated)
    "tests/test_zoo_parity.py::test_eval_forward_parity[MLPModel]",
    "tests/test_reference_module_parity.py::"
    "test_forward_parity_from_reference_weights[ResNetBigger]",
    # post-processing / smoothing
    "tests/test_smoothing.py::test_matches_naive_scan[0]",
    # interval algebra
    "tests/test_intervals.py::test_randomized_against_bruteforce[0]",
    # transcript parsing
    "tests/test_transcript.py::test_segment_classification",
    # checkpoint interop
    "tests/test_utils_and_convert.py::test_convert_checkpoint_roundtrip",
    # inference pipeline
    "tests/test_inference.py::test_probs_match_reference_computation",
    # audio IO
    "tests/test_audio.py::test_wav_roundtrip",
    # CLI flag/validation surface (no compile)
    "tests/test_cli_entry.py::test_sweep_and_compute_features_reject_empty_selection",
    # bench emission guarantee
    "tests/test_bench.py::test_emit_final_diagnostic_when_no_record",
    # parallel/: channel-sharded inference over the 8-device mesh matches
    # the single-device pipeline (a broken sharding path must not sail
    # through the pre-commit gate)
    "tests/test_sharded_inference.py::test_sharded_matches_single",
    # utils/timing: the honest execution barrier every bench/probe
    # measurement routes through (a broken checksum would silently turn
    # all device numbers back into dispatch-rate readings)
    "tests/test_timing.py::test_hard_block_reads_real_values",
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        if item.nodeid in _SMOKE_NODE_IDS:
            item.add_marker(pytest.mark.smoke)
            matched.add(item.nodeid)
    # A renamed test or changed parametrization silently DROPPED its
    # subsystem from the smoke gate (exact-string matching has no other
    # failure signal).  Only enforced on full collections: -k/-m/path
    # selections legitimately collect a subset.
    if config.args in ([], ["tests"], ["tests/"]) and not (
        config.getoption("-k") or config.getoption("-m")
    ):
        missing = _SMOKE_NODE_IDS - matched
        assert not missing, (
            f"smoke node IDs not collected (renamed test or changed "
            f"parametrization?): {sorted(missing)}"
        )
