"""Profiling utilities + checkpoint converter CLI."""

import os
import sys
import time
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laughter_detection_icsi_tpu import models
from laughter_detection_icsi_tpu.train import checkpoint as ckpt
from laughter_detection_icsi_tpu.utils import ThroughputMeter, epoch_time, trace


def test_throughput_meter():
    m = ThroughputMeter(n_chips=2)
    with m.span(audio_seconds=7200.0):
        time.sleep(0.01)
    assert m.audio_seconds == 7200.0
    assert m.x_realtime_per_chip > 0
    assert m.audio_hours_per_sec_per_chip == pytest.approx(
        m.x_realtime_per_chip / 3600
    )
    assert "x realtime/chip" in m.report()


def test_trace_noop_and_real(tmp_path):
    with trace(None):
        pass
    with trace(str(tmp_path / "prof")):
        jax.jit(lambda x: x + 1)(1.0).block_until_ready()
    assert any((tmp_path / "prof").rglob("*"))


def test_epoch_time():
    assert epoch_time(0.0, 125.0) == (2, 5)


def test_convert_checkpoint_roundtrip(tmp_path):
    from cli.convert_checkpoint import main

    model = models.MLPModel(linear_layer_size=16, hid_dim1=8, hid_dim2=4)
    params, state = model.init(jax.random.PRNGKey(0))
    native = ckpt.save_checkpoint(
        str(tmp_path), params, state, epoch=3, global_step=77, best_val_loss=0.4
    )
    pth = str(tmp_path / "out.pth.tar")
    assert main([native, pth]) == 0
    back = str(tmp_path / "back.ckpt.npz")
    assert main([pth, back]) == 0
    loaded = ckpt.load_checkpoint(back)
    assert loaded["epoch"] == 3 and loaded["global_step"] == 77
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded["params"]), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_does_not_clobber_live_checkpoint(tmp_path):
    """Converting INTO a directory holding a live training checkpoint must
    not overwrite its last.ckpt.npz (save_checkpoint always emits that
    name; the converter must stage elsewhere — review finding), and a
    mid-epoch epoch_step must survive conversion."""
    from cli.convert_checkpoint import main

    model = models.MLPModel(linear_layer_size=16, hid_dim1=8, hid_dim2=4)
    params, state = model.init(jax.random.PRNGKey(1))
    # the "live run" checkpoint in the destination dir
    live = ckpt.save_checkpoint(
        str(tmp_path), params, state, epoch=9, global_step=900, epoch_step=17
    )
    live_bytes = open(live, "rb").read()

    src_dir = tmp_path / "src"
    src = ckpt.save_checkpoint(
        str(src_dir), params, state, epoch=1, global_step=5, epoch_step=3
    )
    dest = str(tmp_path / "converted.ckpt.npz")
    assert main([src, dest]) == 0
    assert open(live, "rb").read() == live_bytes  # untouched
    loaded = ckpt.load_checkpoint(dest)
    assert loaded["global_step"] == 5
    assert loaded["epoch_step"] == 3  # forwarded, not dropped


def test_corrupt_checkpoint_error(tmp_path):
    p = tmp_path / "last.ckpt.npz"
    p.write_bytes(b"PK\x03\x04 definitely not a real npz")
    with pytest.raises(ValueError, match="corrupt or unreadable"):
        ckpt.load_checkpoint(str(p))


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax

    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    from laughter_detection_icsi_tpu.utils.compile_cache import host_fingerprint

    d = str(tmp_path / "jc")
    # The cache lives under a host-fingerprinted subdirectory: XLA:CPU AOT
    # artifacts bake in the compiling host's CPU features, so hosts with
    # different feature sets (or a forced-CPU child vs a TPU parent) must
    # never share entries (MULTICHIP_r02 cpu_aot_loader feature mismatches).
    used = enable_compilation_cache(d)
    assert used == os.path.join(d, host_fingerprint())
    assert os.path.isdir(used)
    assert jax.config.jax_compilation_cache_dir == used
    # Fingerprint is stable on one host, changes with the platform hint.
    fp = host_fingerprint()
    assert host_fingerprint() == fp
    monkeypatch.setenv("JAX_PLATFORMS", "something_else")
    assert host_fingerprint() != fp
    monkeypatch.delenv("JAX_PLATFORMS")
    # env-var disable
    monkeypatch.setenv("LAD_JAX_CACHE_DIR", "off")
    assert enable_compilation_cache() is None


# --------------------------------------------------------------------------- #
# .env loader (config.load_env)
# --------------------------------------------------------------------------- #


def test_load_env_inline_comments_and_quotes(tmp_path, monkeypatch):
    """python-dotenv semantics: unquoted values lose ' # ...' inline
    comments; quoted values keep '#' verbatim; full-line comments skipped."""
    from laughter_detection_icsi_tpu import config as cfg

    env = tmp_path / ".env"
    env.write_text(
        "# full-line comment\n"
        "PLAIN=/data/icsi  # corpus root\n"
        "QUOTED='/data/a # not a comment'\n"
        'DQUOTED="x # y"\n'
        "EMPTYVAL= # only a comment\n"
        "NOCOMMENT=bare\n"
    )
    for k in ("PLAIN", "QUOTED", "DQUOTED", "EMPTYVAL", "NOCOMMENT"):
        monkeypatch.delenv(k, raising=False)
    parsed = cfg.load_env(str(env))
    assert parsed["PLAIN"] == "/data/icsi"
    assert parsed["QUOTED"] == "/data/a # not a comment"
    assert parsed["DQUOTED"] == "x # y"
    assert parsed["EMPTYVAL"] == ""
    assert parsed["NOCOMMENT"] == "bare"
    import os

    assert os.environ["PLAIN"] == "/data/icsi"


def test_load_env_no_override(tmp_path, monkeypatch):
    from laughter_detection_icsi_tpu import config as cfg

    env = tmp_path / ".env"
    env.write_text("KEEPME=new\n")
    monkeypatch.setenv("KEEPME", "old")
    cfg.load_env(str(env))
    import os

    assert os.environ["KEEPME"] == "old"
    cfg.load_env(str(env), override=True)
    assert os.environ["KEEPME"] == "new"


def test_load_env_dotenv_syntax(tmp_path, monkeypatch):
    """python-dotenv syntax the reference relied on: export prefixes and
    quoted values with trailing inline comments."""
    import os

    from laughter_detection_icsi_tpu.config import load_env

    envf = tmp_path / "x.env"
    envf.write_text(
        'export DATA_DIR=/data/icsi\n'
        'MODEL_PATH="/models/best.ckpt" # prod model\n'
        "TAG='hash#inside'\n"
        "PLAIN=value # comment\n"
    )
    for k in ("DATA_DIR", "MODEL_PATH", "TAG", "PLAIN", "export DATA_DIR"):
        monkeypatch.delitem(os.environ, k, raising=False)
    parsed = load_env(str(envf))
    assert parsed == {
        "DATA_DIR": "/data/icsi",
        "MODEL_PATH": "/models/best.ckpt",
        "TAG": "hash#inside",
        "PLAIN": "value",
    }
    assert os.environ["DATA_DIR"] == "/data/icsi"
    assert "export DATA_DIR" not in os.environ


def test_load_env_explicit_missing_file_raises(tmp_path):
    from laughter_detection_icsi_tpu.config import load_env

    with pytest.raises(FileNotFoundError):
        load_env(str(tmp_path / "typo.env"))


def test_model_map_presets_immutable():
    from laughter_detection_icsi_tpu.config import MODEL_MAP

    preset = MODEL_MAP["resnet_base"]
    assert isinstance(preset.filter_sizes, tuple)
    with pytest.raises(AttributeError):
        preset.filter_sizes = (1, 2)


def test_fp_confusion_rejects_empty_filter(tmp_path):
    import pandas as pd

    from laughter_detection_icsi_tpu import viz

    csv = tmp_path / "eval.csv"
    pd.DataFrame(
        {
            "threshold": [0.5],
            "min_len": [0.2],
            "tot_fp_speech_time": [1.0],
            "tot_fp_noise_time": [0.5],
            "tot_fp_silence_time": [0.1],
        }
    ).to_csv(csv, index=False)
    with pytest.raises(ValueError, match="no evaluation rows"):
        viz.plot_fp_confusion(str(csv), min_len=0.25)
