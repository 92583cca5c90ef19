from mo_etl_spark.operators.joins import asof_join, range_join, top_k_per_group

__all__ = ["asof_join", "range_join", "top_k_per_group"]
