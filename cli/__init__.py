"""CLI entry points mirroring the reference scripts' flag surfaces.

Each module exposes ``main(argv=None)``; the repo-root wrapper scripts
(``segment_laughter.py``, ``train.py``, ``compute_features.py``,
``create_data_df.py``, ``analyse.py``) keep the reference invocation
commands working verbatim (BASELINE.json: "Public entry points ... keep
their CLIs").
"""
