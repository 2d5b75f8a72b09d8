"""Training: jitted steps, Adam, metrics, checkpointing."""
