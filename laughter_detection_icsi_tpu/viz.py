"""Plots over training metrics and evaluation outputs.

Rebuild of reference visualise.py:21-268 against this framework's file
formats: ``metrics.csv`` written by the train loop (train/loop.py), and the
``*_eval_df_per_meeting.csv`` / ``*_sum_stats.csv`` written by the evaluator
(eval/analyse.py).  Headless-safe (Agg backend).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def plot_train_metrics(
    metrics_csv: str, out_path: Optional[str] = None, title: Optional[str] = None
):
    """2x2 loss/accuracy/precision/recall grid, train vs val, over
    global_step (reference visualise.py:21-88)."""
    df = pd.read_csv(metrics_csv)
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    panels = [("loss", "Loss"), ("acc", "Accuracy"),
              ("precision", "Precision"), ("recall", "Recall")]
    # Epoch axis data is panel-independent: compute once, not per panel.
    firsts = None
    if "epoch" in df.columns and df["epoch"].nunique() > 1:
        firsts = df.groupby("epoch")["global_step"].min()
    for ax, (key, label) in zip(axes.flat, panels):
        for prefix, style in (("train", "-"), ("val", "--")):
            col = f"{prefix}_{key}"
            if col in df.columns:
                ax.plot(df["global_step"], df[col], style, label=prefix)
        ax.set_xlabel("global step")
        ax.set_ylabel(label)
        ax.legend()
        ax.grid(alpha=0.3)
        if firsts is not None:
            top = ax.secondary_xaxis("top")
            top.set_xticks(firsts.values)
            top.set_xticklabels([f"e{int(e)}" for e in firsts.index])
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def _draw_pr_curves(ax, df: pd.DataFrame, label: Optional[str] = None):
    """One precision-recall line per min_length (threshold as the curve
    parameter) onto ``ax`` — shared by :func:`plot_precision_recall` and
    :func:`plot_experiment_comparison` so their styling cannot drift."""
    for min_len, g in df.groupby("min_len"):
        g = g.sort_values("threshold")
        name = f"min_len={min_len}"
        if label:
            name = f"{label} {name}"
        ax.plot(g["recall"], g["precision"], "o-", label=name, markersize=3)


def _finish_pr_axes(fig, ax, out_path: Optional[str]):
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.05)
    ax.grid(alpha=0.3)
    ax.legend()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def _match_min_len(df: pd.DataFrame, min_len: float) -> pd.DataFrame:
    """Rows whose min_len equals ``min_len`` at 6-decimal precision.

    Exact float equality would reject reference-exported grids carrying
    float-repr noise (np.arange min_lens like 0.30000000000000004) even
    though the 0.3 row visibly exists in the CSV — same normalization as
    cli/parity.py's grid join.
    """
    return df[df["min_len"].round(6) == round(min_len, 6)]


def plot_precision_recall(
    sum_stats_csv: str,
    out_path: Optional[str] = None,
    label: Optional[str] = None,
    min_len: Optional[float] = None,
):
    """Precision-recall curves, one line per min_length, threshold as the
    parameter (reference visualise.py:90-121).  ``min_len`` filters the
    sweep to a single smoothing setting (one curve)."""
    df = pd.read_csv(sum_stats_csv)
    if min_len is not None:
        df = _match_min_len(df, min_len)
        if df.empty:
            # An out-of-grid filter would render an empty (yet saved) figure.
            raise ValueError(
                f"no sweep rows with min_len={min_len} in {sum_stats_csv}"
            )
    fig, ax = plt.subplots(figsize=(7, 6))
    _draw_pr_curves(ax, df, label)
    return _finish_pr_axes(fig, ax, out_path)


def plot_fp_confusion(
    eval_df_csv: str,
    out_path: Optional[str] = None,
    thresholds: Sequence[float] = (),
    min_len: Optional[float] = None,
):
    """Heatmap of false-positive time attributed to speech/noise/silence per
    (threshold, min_len) — grouped on BOTH like the reference
    (visualise.py:123-168 aggregates ['threshold', 'min_len']); summing
    across min_lens would multiply every cell by the grid size and mix
    distinct smoothing parametrizations.  ``min_len`` filters to one
    setting; default shows each (threshold, min_len) as its own row."""
    df = pd.read_csv(eval_df_csv)
    if thresholds:
        # Same 6-decimal normalization as _match_min_len, for the same
        # float-repr-noise reason.
        df = df[df["threshold"].round(6).isin([round(t, 6) for t in thresholds])]
    if min_len is not None:
        df = _match_min_len(df, min_len)
    if df.empty:
        # A filter value outside the sweep grid would otherwise render a
        # blank heatmap and report success.
        raise ValueError(
            f"no evaluation rows match thresholds={list(thresholds)} "
            f"min_len={min_len} in {eval_df_csv}"
        )
    agg = (
        df.groupby(["threshold", "min_len"])[
            ["tot_fp_speech_time", "tot_fp_noise_time", "tot_fp_silence_time"]
        ]
        .sum()
        .sort_index()
    )
    fig, ax = plt.subplots(figsize=(7, max(3, 0.5 * len(agg))))
    data = agg.values
    im = ax.imshow(data, aspect="auto", cmap="viridis")
    ax.set_xticks(range(3))
    ax.set_xticklabels(["speech", "noise", "silence"])
    ax.set_yticks(range(len(agg)))
    ax.set_yticklabels([f"t={t} l={l}" for t, l in agg.index])
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            ax.text(j, i, f"{data[i, j]:.1f}", ha="center", va="center",
                    color="white", fontsize=8)
    ax.set_title("false-positive time [s] by type")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def plot_experiment_comparison(
    sum_stats_csvs: Dict[str, str],
    out_path: Optional[str] = None,
    min_len: Optional[float] = None,
):
    """Overlay precision-recall curves of several experiments
    (reference visualise.py:173-268)."""
    fig, ax = plt.subplots(figsize=(7, 6))
    for name, path in sum_stats_csvs.items():
        df = pd.read_csv(path)
        if min_len is not None:
            df = _match_min_len(df, min_len)
            if df.empty:
                # Silently skipping one experiment would produce a
                # "comparison" missing a contender without any signal.
                raise ValueError(
                    f"no sweep rows with min_len={min_len} in {path} "
                    f"(experiment {name!r})"
                )
        _draw_pr_curves(ax, df, label=name)
    return _finish_pr_axes(fig, ax, out_path)
