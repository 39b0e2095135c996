from .queries import (
    query_latest,
    query_latest_stratified,
    query_timestamped,
    query_timestamped_stratified,
)

__all__ = [
    "query_latest",
    "query_timestamped",
    "query_latest_stratified",
    "query_timestamped_stratified",
]
