from .pipeline import PipelineContext, run_stage  # noqa: F401
