"""Shim namespace root for the bundled-protobuf fallback.

This directory is NOT importable in normal operation — it is inserted
into ``sys.path`` (driver) / shipped via ``addPyFile`` (workers) only
by ``pmc_conversion_spark.streaming.stateful.ensure_protobuf`` when no
installed ``google.protobuf`` exists. See
``google/protobuf/__init__.py`` for what it does and why.

``extend_path`` below (ADVICE r6 #1): ``google`` is a NAMESPACE shared
by many installed distributions (google-auth, googleapis-common-protos,
...). Once this dir is on sys.path, a plain package here would shadow
all of them — every ``google.*`` import would resolve against this
directory only. Extending ``__path__`` keeps the rest of the namespace
importable on hosts that have other ``google.*`` packages but no
protobuf.
"""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)
