from .upsert import ParquetLatestSink
from .archive import JsonArchiveSink, DualSink
from .delta import DeltaLatestSink, TableFormatUnavailable, delta_available

__all__ = [
    "ParquetLatestSink",
    "JsonArchiveSink",
    "DualSink",
    "DeltaLatestSink",
    "TableFormatUnavailable",
    "delta_available",
]
