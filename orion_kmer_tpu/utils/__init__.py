from .progress import track_progress_and_resources, setup_logging

__all__ = ["track_progress_and_resources", "setup_logging"]
