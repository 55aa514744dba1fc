"""Runtime utilities: checkpointing, logging, label metadata."""
