"""Utilities: checkpointing, profiling, config."""
