from bigdata_hits_spark.plans.iterate import normalized, materialize

__all__ = ["normalized", "materialize"]
