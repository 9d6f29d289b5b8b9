from odibi_spark.io.read import read_source, read_table, scale_out
from odibi_spark.io.write import write_sink

__all__ = ["read_table", "read_source", "scale_out", "write_sink"]
