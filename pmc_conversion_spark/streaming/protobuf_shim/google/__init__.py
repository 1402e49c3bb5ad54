"""Shim namespace root for the bundled-protobuf fallback.

This directory is NOT importable in normal operation — it is inserted
into ``sys.path`` (driver) / shipped via ``addPyFile`` (workers) only
by ``pmc_conversion_spark.streaming.stateful.ensure_protobuf`` when no
installed ``google.protobuf`` exists. See
``google/protobuf/__init__.py`` for what it does and why.
"""
