from odibi_spark.io.read import read_source, read_table
from odibi_spark.io.write import write_sink

__all__ = ["read_table", "read_source", "write_sink"]
