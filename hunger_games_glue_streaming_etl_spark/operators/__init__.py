from .tribute import derive_tribute_status, tribute_status_output
from .relational import latest_per_key, top_k_per_group

__all__ = [
    "derive_tribute_status",
    "tribute_status_output",
    "latest_per_key",
    "top_k_per_group",
]
