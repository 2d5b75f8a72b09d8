"""On-device compute ops: featurizer, window extraction, smoothing, kernels."""
