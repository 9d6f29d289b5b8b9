from odibi_spark.state.hwm import JsonStateBackend, ParquetStateBackend, StateBackend

__all__ = ["StateBackend", "JsonStateBackend", "ParquetStateBackend"]
