from .pipeline import run_batch_pipeline  # noqa: F401
