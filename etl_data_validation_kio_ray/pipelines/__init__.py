from .validate import ValidationPipeline, RunResult

__all__ = ["ValidationPipeline", "RunResult"]
