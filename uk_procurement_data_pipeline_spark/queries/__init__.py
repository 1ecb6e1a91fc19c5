from uk_procurement_data_pipeline_spark.queries.base import QuerySpec, register, registry

__all__ = ["QuerySpec", "register", "registry"]
