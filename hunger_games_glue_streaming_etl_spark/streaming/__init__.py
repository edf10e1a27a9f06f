from .pipeline import start_tribute_stream, TRIBUTE_STREAM_SCHEMA

__all__ = ["start_tribute_stream", "TRIBUTE_STREAM_SCHEMA"]
