from .upsert import ParquetLatestSink
from .archive import JsonArchiveSink, DualSink

__all__ = ["ParquetLatestSink", "JsonArchiveSink", "DualSink"]
