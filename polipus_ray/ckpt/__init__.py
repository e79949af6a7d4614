from .manifest import CheckpointManager

__all__ = ["CheckpointManager"]
