"""Runtime utilities: checkpointing, KV logging, profiling, config."""
