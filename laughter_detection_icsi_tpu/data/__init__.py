"""Data layer: audio decoding, manifests, feature cache, sample generation."""
