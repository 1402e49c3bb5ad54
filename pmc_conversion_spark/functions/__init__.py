"""Scalar / text / dedup / similarity function library.

Everything here is built from `pyspark.sql.functions` (JVM-side,
codegen'd) unless a docstring explicitly says Pandas-UDF; the hot path
never drops to row-at-a-time Python.
"""
