"""Decision-level bf16-TRAINED vs f32-TRAINED model agreement (VERDICT r04
#6 / PARITY.md #24): a user picking `cli/train.py --precision bfloat16`
needs to know what changes in the TRAINED MODEL's detected instances and
F1, not just that toy loss trajectories stay within 5%
(tests/test_mixed_precision.py covers that).
tools/precision_eval_probe.py is the measurement — twin models trained
through the identical batch/key schedule, one f32 and one bf16-compute,
both evaluated through the same f32 windows pipeline; this pins its
behavior at CI scale.

Full-scale measured record (2026-08-21, 4 tracks x 120 s, twins trained
40 steps to loss f32 0.1339 / bf16 0.1402, thresholds 0.2-0.8): max F1
delta 0.0457 — with the bf16 twin BETTER at 3 of 4 thresholds (trajectory
divergence, not systematic degradation) — event agreement 99.1% (440/444
events matched), mean matched-boundary shift <= 59 ms.  Anchor run
(run_probe(twin_b_dtype=None, twin_b_seed=7), same protocol): f32-vs-f32
twins differing only in data seed measure max F1 delta 0.0521 / 97.1%
agreement — bf16 training deviates from f32 by LESS than natural
seed-to-seed training variance.  The CI-scale bounds below are looser
(weaker training, less audio) but fail loudly if bf16 training drifts
from f32 at the decision level."""

import numpy as np

from tools.precision_eval_probe import run_probe


def test_bf16_trained_model_agrees_at_decision_level():
    out = run_probe(
        seconds=24.0,
        n_tracks=2,
        train_steps=14,
        batch=48,
        thresholds=(0.3, 0.5),
        min_lengths=(0.2,),
        seed=1,
    )
    # Both twins must have learned SOMETHING, or the comparison is vacuous
    # (untrained models emit ~0.5 everywhere and no threshold fires).
    assert out["f32_train_loss"] < 0.45, out
    assert out["bf16_train_loss"] < 0.45, out
    total_events = sum(
        v["matched_events"] + v["f32_only_events"] + v["bf16_only_events"]
        for v in out["per_key"].values()
    )
    assert total_events > 0, out
    # Decision-level agreement: the twins detect (nearly) the same
    # instances with (nearly) the same F1.  Full-scale measured values are
    # pinned in the module docstring; CI bounds are deliberately looser.
    assert out["max_f1_delta"] <= 0.1, out
    assert out["event_agreement"] >= 0.8, out
    for v in out["per_key"].values():
        assert v["mean_boundary_shift_s"] <= 0.25, v
