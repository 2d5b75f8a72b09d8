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


def _per_meeting_at_threshold(
    eval_df_csv: str, threshold: float, min_len: Optional[float]
) -> pd.DataFrame:
    """Per-meeting eval rows at one threshold (and optionally one min_len),
    with the same 6-decimal float normalization as the other filters.
    Raises when the filter empties — a blank histogram saved as a PNG would
    report success for an out-of-grid threshold — and when ``min_len`` is
    None while the CSV carries SEVERAL min_len settings: pooling them
    would put every meeting in the histogram once per grid value and mix
    distinct smoothing parametrizations (the failure plot_fp_confusion's
    docstring documents; these per-meeting plots had it until round 4)."""
    df = pd.read_csv(eval_df_csv)
    df = df[df["threshold"].round(6) == round(threshold, 6)]
    if min_len is not None:
        df = _match_min_len(df, min_len)
    elif "min_len" in df.columns:
        lens = sorted(df["min_len"].round(6).unique())
        if len(lens) > 1:
            raise ValueError(
                f"eval_df has {len(lens)} min_len settings {lens}; pass "
                "min_len= (CLI: --min_len) to pick one — pooling would "
                "count every meeting once per setting"
            )
    if df.empty:
        raise ValueError(
            f"no evaluation rows at threshold={threshold} "
            f"min_len={min_len} in {eval_df_csv}"
        )
    return df


def plot_aggregated_laughter_length_dist(
    eval_df_csv: str,
    threshold: float,
    out_path: Optional[str] = None,
    min_len: Optional[float] = None,
):
    """Histograms of per-meeting aggregated laughter time, predicted vs
    transcribed, at one threshold — three stacked panels zooming from the
    full range down to the short tail (reference analyse.py:303-357).

    Reads the per-meeting eval_df CSV the evaluator writes.  Differences
    from the reference: meeting counts come from the data instead of the
    hard-coded 75/56-min constants, and the deprecated sns.distplot is
    replaced with plain matplotlib histograms.
    """
    df = _per_meeting_at_threshold(eval_df_csv, threshold, min_len)
    cols = ["tot_pred_time", "tot_transc_laugh_time"]
    # Same zoom levels as the reference: coarse, medium, fine.
    panels = [(1000, 50), (500, 10), (60, 1)]
    fig, axs = plt.subplots(3, 1, figsize=(6, 8))
    for ax, (xmax, step) in zip(axs, panels):
        for col in cols:
            ax.hist(
                df[col], bins=np.arange(0, xmax + step, step),
                alpha=0.5, label=col,
            )
        ax.set_xlim(0, xmax)
        ax.grid(alpha=0.3)
    axs[-1].set_xlabel("Aggregated length [s]")
    axs[0].legend(fontsize=8)
    fig.supylabel("meetings")
    pred_median = float(df[cols[0]].median())
    transc_median = float(df[cols[1]].median())
    n_pred = int((df["tot_pred_time"] > 0).sum())
    fig.suptitle(
        f"Aggregated laughter per meeting (threshold {threshold})\n"
        f"median pred {pred_median:.2f}s / transc {transc_median:.2f}s; "
        f"{n_pred}/{len(df)} meetings with predictions",
        fontsize=10,
    )
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return fig


def plot_agg_pred_time_ratio_dist(
    eval_df_csv: str,
    threshold: float,
    out_path: Optional[str] = None,
    min_len: Optional[float] = None,
):
    """Distribution over meetings of predicted/transcribed laughter-time
    ratio (percent) at one threshold, with median/mean markers and the
    corpus-weighted precision/recall printed on the figure
    (reference analyse.py:359-411).

    Differences from the reference: meetings with zero transcribed laughter
    are dropped from the ratio (the reference divides by zero into inf bins),
    and the figure annotation computes weighted precision/recall directly
    from the filtered rows — the reference's annotation code indexes
    calc_sum_stats' output with a stale multi-index layout and crashes
    (analyse.py:391-396 against the flat frame built at :280-290).
    """
    df = _per_meeting_at_threshold(eval_df_csv, threshold, min_len)
    with_gt = df[df["tot_transc_laugh_time"] > 0]
    if with_gt.empty:
        raise ValueError(
            f"no meetings with transcribed laughter at threshold={threshold} "
            f"in {eval_df_csv}"
        )
    ratio = with_gt["tot_pred_time"] / with_gt["tot_transc_laugh_time"] * 100.0
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.hist(ratio, bins=30, alpha=0.7)
    ax.set_xlabel("pred_time / transc_time [%]")
    ax.set_ylabel("meetings")
    ax.grid(axis="y", alpha=0.3)
    ymax = ax.get_ylim()[1]
    ax.vlines(float(ratio.median()), 0, ymax, colors="r",
              linestyles="dashed", label=f"median {ratio.median():.1f}%")
    ax.vlines(float(ratio.mean()), 0, ymax, colors="b",
              linestyles="dashed", label=f"mean {ratio.mean():.1f}%")
    ax.legend()
    # Corpus-weighted stats over the filtered rows (sum times, then divide —
    # same rule as eval.analyse.calc_sum_stats).
    tot_pred = float(df["tot_pred_time"].sum())
    tot_corr = float(df["corr_pred_time"].sum())
    tot_transc = float(df["tot_transc_laugh_time"].sum())
    prec = 1.0 if tot_pred == 0 else tot_corr / tot_pred
    recall = float("nan") if tot_transc == 0 else tot_corr / tot_transc
    ax.set_title(
        f"Predicted vs transcribed laughter time (threshold {threshold})\n"
        f"weighted precision {prec:.3f}, recall {recall:.3f}; "
        f"{int((df['tot_pred_time'] > 0).sum())}/{len(df)} meetings "
        f"with predictions",
        fontsize=10,
    )
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
