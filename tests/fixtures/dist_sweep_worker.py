"""Worker for the multi-process sharded-inference test.

Two coordinator-joined processes run ShardedPipeline over the SAME
deterministic meeting: every process passes all channel paths, but decodes
and uploads only its own channel block (probs_for_meeting_device), then
postprocesses only its rows (local_channels) through the on-device
threshold sweep.  The parent compares each process's local rows against the
single-process run of the identical meeting.

Usage: dist_sweep_worker.py <pid> <nproc> <port> <out_json> <audio_dir>
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

N_CHANNELS = 4
THRESHOLDS = [0.2, 0.5]
MIN_LENGTHS = [0.0, 0.1]


def write_meeting(audio_dir: str) -> list:
    """Deterministic 4-channel 'meeting' of int16 wavs (distinct lengths are
    NOT allowed within a batch bucket run — keep them equal like real ICSI
    channels)."""
    import numpy as np

    from laughter_detection_icsi_tpu.data import audio as audio_io

    rng = np.random.default_rng(77)
    paths = []
    for ch in range(N_CHANNELS):
        w = (rng.standard_normal(16000 * 3) * 0.05).astype(np.float32)
        w[16000 : 16000 + 8000] += 0.3 * np.sin(
            np.linspace(0, 400 * np.pi, 8000) + ch
        )
        p = str(Path(audio_dir) / f"chan{ch}.wav")
        audio_io.write_wav(p, w, 16000)
        paths.append(p)
    return paths


def run_pipeline(mesh, paths):
    import jax

    from tests.fixtures import dist_common as C  # noqa: F401 (model helpers)

    from laughter_detection_icsi_tpu import inference, models
    from laughter_detection_icsi_tpu.ops import smoothing
    from laughter_detection_icsi_tpu.parallel import ShardedPipeline

    # Tiny filter plan, same as test_sharded_inference's fixture: the
    # multi-host mechanics under test are size-independent.
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    pipe = ShardedPipeline(
        model=model,
        params=params,
        state=state,
        mesh=mesh,
        settings=inference.InferenceSettings(chunk=128, bucket_frames=256),
    )
    (probs_dev, ts), durations = pipe.probs_for_meeting_device(paths)
    rows = pipe.local_channels(probs_dev, len(paths))
    out = {}
    for i, row in rows:
        import numpy as np

        t_i = ts[i]
        fps = t_i / durations[i]
        instances = smoothing.instances_from_device_probs(
            row[:t_i], thresholds=THRESHOLDS, min_lengths=MIN_LENGTHS, fps=fps
        )
        out[str(i)] = {
            "probs_head": np.asarray(row[:8]).round(6).tolist(),
            "probs_sum": float(np.asarray(row[:t_i]).sum()),
            "t": int(t_i),
            "duration": durations[i],
            "instances": {
                f"{thr}_{ml}": [[round(a, 4), round(b, 4)] for a, b in insts]
                for (thr, ml), insts in instances.items()
            },
        }
    return out


def main() -> None:
    pid, nproc, port, out_path, audio_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
        sys.argv[5],
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from laughter_detection_icsi_tpu.parallel import distributed, make_mesh

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        cpu_collectives="gloo",
    )

    paths = write_meeting(audio_dir) if pid == 0 else [
        str(Path(audio_dir) / f"chan{ch}.wav") for ch in range(N_CHANNELS)
    ]
    # Every process needs the files on "its" filesystem; here they share
    # one tmp dir, so just make sure the writer finished first.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("meeting_files_written")

    out = run_pipeline(make_mesh(), paths)
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
