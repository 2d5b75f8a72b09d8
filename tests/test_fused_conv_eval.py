"""Decision-level fused_conv vs windows agreement (VERDICT #3 / PARITY.md
#25): a user picking `--mode fused_conv` needs to know what changes in
detected INSTANCES and F1, not just per-window probability closeness
(tests/test_fully_conv.py covers that).  tools/fused_conv_eval_probe.py
is the measurement; this pins its behavior at CI scale.

Full-scale measured record (chip, 2026-08-20, 4 tracks x 120 s, trained
to loss 0.096, thresholds 0.2-0.8): max F1 delta 0.0042, event agreement
99.1%, mean matched-boundary shift 38-78 ms.  The CI-scale bounds below
are looser (weaker training, less audio) but fail loudly if either mode
drifts from the other at the decision level."""

import numpy as np

from tools.fused_conv_eval_probe import make_track, run_probe


def test_make_track_ground_truth_is_consistent():
    rng = np.random.default_rng(0)
    wave, truth = make_track(rng, 30.0)
    assert len(wave) == 30 * 16000
    assert truth, "no laugh spans generated"
    for s, e in truth:
        assert 0.0 < s < e <= 30.0
        lo, hi = int(s * 16000), int(e * 16000)
        # Laugh spans are LOUD vs background — the separability the probe's
        # training relies on.
        assert np.std(wave[lo:hi]) > 4 * np.std(wave[: int(0.8 * 16000)])


def test_modes_agree_at_decision_level():
    out = run_probe(
        seconds=24.0,
        n_tracks=2,
        train_steps=14,
        batch=48,
        thresholds=(0.3, 0.5),
        min_lengths=(0.2,),
        seed=1,
    )
    # The model must have learned SOMETHING, or the comparison is vacuous
    # (an untrained model emits ~0.5 everywhere and no threshold fires).
    assert out["train_loss"] < 0.45
    total_events = sum(
        v["matched_events"] + v["windows_only_events"] + v["fused_only_events"]
        for v in out["per_key"].values()
    )
    assert total_events > 0, out
    # Decision-level agreement: the two modes detect (nearly) the same
    # instances with (nearly) the same F1.  Full-scale measured values are
    # 0.0042 / 0.991; CI bounds are deliberately looser.
    assert out["max_f1_delta"] <= 0.1, out
    assert out["event_agreement"] >= 0.8, out
    for v in out["per_key"].values():
        assert v["mean_boundary_shift_s"] <= 0.25, v
