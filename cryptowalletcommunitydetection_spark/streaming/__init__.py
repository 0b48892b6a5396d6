from .incremental import IncrementalRunner, available_now_stream  # noqa: F401
