"""Training/eval engine: CV loops, metrics, checkpointing, tuning, bootstrap."""
