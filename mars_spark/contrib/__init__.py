"""Contrib shims (reference: mars/contrib/)."""

from mars_spark.contrib.dask import (  # noqa: F401
    convert_dask_collection,
    mars_scheduler,
)

__all__ = ["mars_scheduler", "convert_dask_collection"]
