"""Warehouse patterns (reference: odibi/patterns/, dispatch
odibi/node.py:1580-1624): scd2, merge, dimension, fact,
date_dimension, aggregation-incremental, delete detection."""
