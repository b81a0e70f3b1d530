from python_async_sample_spark.api.scatter_gather import KeyedQuery

__all__ = ["KeyedQuery"]
