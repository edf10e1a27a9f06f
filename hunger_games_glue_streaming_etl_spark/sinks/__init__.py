from .upsert import ParquetLatestSink
from .archive import JsonArchiveSink, DualSink
from .delta import DeltaLatestSink, TableFormatUnavailable, delta_available
from .foreach_row import JsonRowForeachWriter

__all__ = [
    "ParquetLatestSink",
    "JsonRowForeachWriter",
    "JsonArchiveSink",
    "DualSink",
    "DeltaLatestSink",
    "TableFormatUnavailable",
    "delta_available",
]
