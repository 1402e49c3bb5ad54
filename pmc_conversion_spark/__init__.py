"""pmc_conversion_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
the reference batch-ETL pipeline ``thehyve/pmc-conversion`` (surveyed in
SURVEY.md), re-expressed Spark-first: declarative DataFrame plans for
Catalyst/Tungsten to optimize, Structured Streaming for ingest, and
Arrow-vectorized Pandas UDFs only where built-ins cannot express the
semantics.

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    tables      loaders for the driver-provided parquet star schema
    sources/    scans (csv/binary/sidecar/gzip/parquet) and sinks
    operators/  manifest algebra, joins, aggregations, windows, set ops
    functions/  scalar funcs, dates, text analysis, dedup, similarity
    plans/      config-driven CSR pipeline: priority merge, codebook
                decode, EAV unpivot, ontology tree, incremental layer
    streaming/  drop-zone file stream + event-time windowing
    queries/    the registry mapped into __spark_entry__.py
"""

__version__ = "0.1.0"
