from .extract import KeyExtractor, ts_to_us

__all__ = ["KeyExtractor", "ts_to_us"]
