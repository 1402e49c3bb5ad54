"""Custom Python DataSource for the reference codebook record format.

Spark 4's Python DataSource API (SPARK-44076) lets the engine expose
the reference's non-rectangular codebook files (group line + mapping
lines, ``\\r``-only terminators — sources/codebook.py documents the
grammar) as a REAL reader:

    spark.dataSource.register(CodebookDataSource)
    spark.read.format("pmc_codebook").load(path)  # or a directory

One input file = one read partition (codebooks are small config-plane
files; the parallel unit is the file, matching how Spark's own text
sources split unsplittable files). The parse itself reuses the exact
parser the driver-side path uses, so both roads yield identical rows.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import StructType

SCHEMA_DDL = "column string, code string, label string"


class CodebookDataSource(DataSource):
    """``format("pmc_codebook")`` — (column, code, label) rows."""

    @classmethod
    def name(cls) -> str:
        return "pmc_codebook"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> "CodebookReader":
        return CodebookReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path

    # partitions must be picklable InputPartitions; a bare path is
    def __repr__(self) -> str:
        return f"CodebookFile({self.path})"


class CodebookReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pmc_codebook requires a load(path)")

    def partitions(self):
        import os
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if not f.startswith(".") and not f.endswith(".sha1"))
        else:
            files = [p]
        if not files:
            raise FileNotFoundError(f"no codebook files under {p}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        # executor-side: parse one whole file (codebook records span
        # lines, so the file is the atomic unit)
        from pmc_conversion_spark.sources.codebook import \
            parse_codebook_file
        yield from parse_codebook_file(partition.path)
