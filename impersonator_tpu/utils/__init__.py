"""Host-side utilities: image/video IO, checkpointing, logging."""
