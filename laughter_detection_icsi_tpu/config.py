"""Unified typed configuration for the framework.

The reference scatters configuration across three mechanisms (see SURVEY.md §5.6):
``config.py`` dicts (reference config.py:7-63), a ``.env`` file parsed with
python-dotenv (reference sample.env:1-7), and per-CLI argparse.  Here they are
unified into typed dataclasses with the same preset names and knob values so the
reference CLIs keep working, plus a dependency-free ``.env`` loader.

Parity notes:
- ``MODEL_MAP`` keys/values mirror reference config.py:9-26.
- ``FeatConfig`` mirrors reference config.py:28-31 (100 frames/s, 44 mel bins).
  The reference comment says 40 filters but the live value is 44
  (reference config.py:14,30) — we keep 44 and parameterize.
- ``AnalysisConfig`` mirrors reference config.py:33-63 (min_length 0.2 s,
  1 ms eval frames, 1.0 s train subsamples, seed 23, 0.8/0.1 split).
"""

from __future__ import annotations

import dataclasses
import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple


# --------------------------------------------------------------------------- #
# Model presets                                                               #
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class ModelPreset:
    """One entry of the reference's MODEL_MAP (reference config.py:9-26)."""

    name: str
    model: str  # model-zoo architecture name, resolved by models.build()
    batch_size: int
    linear_layer_size: int
    # Tuple, not List: frozen=True blocks rebinding but not in-place
    # mutation — a List here would let callers corrupt the shared
    # module-global presets.
    filter_sizes: Tuple[int, ...]
    log_frequency: int
    # Kept for CLI-surface parity; unused by the ICSI pipeline
    # (reference config.py:12,22).
    val_data_text_path: str = "./data/switchboard/val/switchboard_val_data.txt"


MODEL_MAP: Dict[str, ModelPreset] = {
    "resnet_base": ModelPreset(
        name="resnet_base",
        model="ResNetBigger",
        batch_size=32,
        # For (100, 44) log-mel windows: three stride-2 stages + AvgPool(4)
        # leave a (3, 1) map with 16 channels = 48 features
        # (reference config.py:14-15).
        linear_layer_size=48,
        filter_sizes=(64, 32, 16, 16),
        log_frequency=900,
    ),
    "resnet_with_augmentation": ModelPreset(
        name="resnet_with_augmentation",
        model="ResNetBigger",
        batch_size=32,
        linear_layer_size=128,
        filter_sizes=(128, 64, 32, 32),
        log_frequency=200,
    ),
}


# --------------------------------------------------------------------------- #
# Feature extraction                                                          #
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class FeatConfig:
    """Log-mel (Fbank) featurizer configuration.

    ``num_samples`` frames per second and ``num_filters`` mel bins mirror
    reference config.py:28-31; the remaining knobs pin down the Kaldi fbank
    semantics that the reference inherits from Lhotse's ``Fbank`` defaults
    (reference utils/utils.py:25) and that our on-device featurizer
    reimplements (ops/fbank.py).
    """

    num_samples: int = 100  # output frames per second -> frame_shift = 1/100 s
    num_filters: int = 44
    sampling_rate: int = 16000
    frame_length: float = 0.025  # seconds
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"
    dither: float = 0.0
    snip_edges: bool = False
    energy_floor: float = 1e-10
    low_freq: float = 20.0
    high_freq: float = -400.0  # negative => offset from Nyquist
    round_to_power_of_two: bool = True

    @property
    def frame_shift(self) -> float:
        return 1.0 / self.num_samples

    @property
    def frame_shift_samples(self) -> int:
        return int(round(self.frame_shift * self.sampling_rate))

    @property
    def frame_length_samples(self) -> int:
        return int(round(self.frame_length * self.sampling_rate))

    @property
    def fft_size(self) -> int:
        n = self.frame_length_samples
        if not self.round_to_power_of_two:
            return n
        fft = 1
        while fft < n:
            fft *= 2
        return fft


FEAT = FeatConfig()


# --------------------------------------------------------------------------- #
# Analysis / evaluation                                                       #
# --------------------------------------------------------------------------- #


_ROOT = Path(__file__).absolute().parent.parent


@dataclasses.dataclass
class AnalysisConfig:
    """Mirror of the reference's ANALYSIS dict (reference config.py:33-63)."""

    transcript_dir: str = str(_ROOT / "data/icsi/transcripts")
    speech_dir: str = str(_ROOT / "data/icsi/speech")
    plots_dir: str = "plots"
    eval_df_cache_file: str = "eval_df_per_meeting.csv"
    sum_stats_cache_file: str = "sum_stats.csv"
    force_index_recompute: bool = False

    # 'model' sub-dict (reference config.py:47-54)
    min_length: float = 0.2  # seconds; shorter laughs are invalid
    frame_duration_ms: int = 1  # evaluation frame resolution

    # 'train' sub-dict (reference config.py:56-63)
    subsample_duration: float = 1.0  # seconds per training sample
    random_seed: int = 23
    float_decimals: int = 2
    train_val_test_split: List[float] = dataclasses.field(
        default_factory=lambda: [0.8, 0.1]
    )

    @property
    def frames_per_second(self) -> float:
        return 1000.0 / self.frame_duration_ms


ANALYSIS = AnalysisConfig()


# --------------------------------------------------------------------------- #
# .env loading (dependency-free replacement for python-dotenv)                #
# --------------------------------------------------------------------------- #


def load_env(env_file: str = ".env", override: bool = False) -> Dict[str, str]:
    """Parse a ``KEY=VALUE`` env file into os.environ (reference sample.env:1-7).

    Lines starting with '#' and blank lines are ignored; ``export`` prefixes
    are stripped and values may be quoted (with or without a trailing inline
    comment) — the python-dotenv syntax the reference used.  Returns the
    parsed mapping.  A missing DEFAULT file is tolerated (walk up from CWD
    like dotenv's find_dotenv, else {}); an explicitly named file that does
    not exist raises — silently walking up could load an unrelated
    same-named file from another project and mask the typo.
    """
    parsed: Dict[str, str] = {}
    path = Path(env_file)
    if not path.is_file():
        if env_file != ".env":
            raise FileNotFoundError(f"env file {env_file!r} not found")
        # Walk up from CWD like dotenv's find_dotenv does.
        for parent in [Path.cwd(), *Path.cwd().parents]:
            candidate = parent / env_file
            if candidate.is_file():
                path = candidate
                break
        else:
            return parsed
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export ") or line.startswith("export\t"):
            # shell-sourceable style, supported by python-dotenv; without
            # the strip the KEY would silently become 'export KEY'
            line = line[len("export") :].strip()
        key, _, value = line.partition("=")
        key = key.strip()
        value = value.strip()
        if not key:
            # '=value' / 'export =x': python-dotenv skips these; setting
            # os.environ[''] raises OSError(EINVAL) and would abort every
            # CLI on an otherwise-valid .env file.
            continue
        m = re.match(r"""(['"])(.*?)\1\s*(?:#.*)?$""", value)
        if m:
            # Quoted (optionally followed by an inline comment): keep the
            # content verbatim (a '#' inside the quotes is data).
            value = m.group(2)
        else:
            # Unquoted: strip inline comments like python-dotenv does —
            # everything from a whitespace-preceded '#' onward.
            m = re.search(r"\s#", value)
            if m:
                value = value[: m.start()].rstrip()
            if value.startswith("#"):
                value = ""
        parsed[key] = value
        if override or key not in os.environ:
            os.environ[key] = value
    return parsed


def env(key: str, default: Optional[str] = None) -> Optional[str]:
    return os.environ.get(key, default)


def parse_float_list(text: str, flag: str = "value list") -> List[float]:
    """Comma-separated floats for CLI flags, tolerant of blanks and spaces
    ('0.5,' / '0.2, 0.4') — a bare float('') raised a raw traceback.  An
    all-blank string is a usage error, not an empty sweep."""
    out = [float(t) for t in text.split(",") if t.strip()]
    if not out:
        raise ValueError(f"{flag}: no values in {text!r}")
    return out


# ICSI partitions (reference create_data_df.py:15-29, taken from the Lhotse
# ICSI recipe to minimise speaker overlap between splits).
PARTITIONS: Dict[str, List[str]] = {
    "train": [
        "Bdb001", "Bed002", "Bed003", "Bed004", "Bed005", "Bed006", "Bed008",
        "Bed009", "Bed010", "Bed011", "Bed012", "Bed013", "Bed014", "Bed015",
        "Bed016", "Bed017", "Bmr001", "Bmr002", "Bmr003", "Bmr005", "Bmr006",
        "Bmr007", "Bmr008", "Bmr009", "Bmr010", "Bmr011", "Bmr012", "Bmr014",
        "Bmr015", "Bmr016", "Bmr019", "Bmr020", "Bmr022", "Bmr023", "Bmr024",
        "Bmr025", "Bmr026", "Bmr027", "Bmr028", "Bmr029", "Bmr030", "Bmr031",
        "Bns002", "Bns003", "Bro003", "Bro004", "Bro005", "Bro007", "Bro008",
        "Bro010", "Bro011", "Bro012", "Bro013", "Bro014", "Bro015", "Bro016",
        "Bro017", "Bro018", "Bro019", "Bro022", "Bro023", "Bro024", "Bro025",
        "Bro026", "Bro027", "Bro028", "Bsr001", "Btr001", "Btr002", "Buw001",
    ],
    "dev": ["Bmr021", "Bns001"],
    "test": ["Bmr013", "Bmr018", "Bro021"],
}


def split_of_meeting(meeting_id: str) -> str:
    if meeting_id in PARTITIONS["dev"]:
        return "dev"
    if meeting_id in PARTITIONS["test"]:
        return "test"
    return "train"
