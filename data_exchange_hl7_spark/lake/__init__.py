from data_exchange_hl7_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
