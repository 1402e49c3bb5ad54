"""Scans (csv/binary/sidecar/gzip/parquet) and sinks (TSV staging,
transactional swap, versioned snapshots)."""
