"""Source/sink format adapters for pages-shaped tables."""

from curator_spark.sources.pages_io import read_pages, write_pages_as

__all__ = ["read_pages", "write_pages_as"]
