"""Ground-truth and evaluation core: transcripts, interval indices, metrics."""
