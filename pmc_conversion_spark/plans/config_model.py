"""Config model — the engine's logical-plan input.

Mirrors the *shape* of the reference's ``sources_config.json``
(test_data_e2e/current/config/sources_config.json:2-458): entities own
attributes; each attribute lists its contributing (file, column) sources
in priority order, optionally with a per-source date format; files carry
a delimiter override and optional codebook binding
(sources_config.json:459-480). Schemas are config-declared, never
inferred (SURVEY.md §1.1: schema-on-config; fail on missing columns,
ignore extras).
"""

from __future__ import annotations

from dataclasses import dataclass, field

KINDS = ("text", "numeric", "date")


@dataclass(frozen=True)
class SourceRef:
    """One contributing source for an attribute: take ``column`` from
    ``file`` (column omitted -> attribute name, sources_config.json:
    185-189); ``date_format`` is one of functions.dates.FORMATS."""
    file: str
    column: str | None = None
    date_format: str | None = None


@dataclass(frozen=True)
class Attribute:
    name: str
    kind: str = "text"
    sources: tuple[SourceRef, ...] = ()

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"attribute {self.name!r}: bad kind {self.kind!r}")


@dataclass(frozen=True)
class EntityConfig:
    """A CSR entity: id attribute + attributes (sources_config.json:3-112
    for Individual)."""
    name: str
    id_attr: str
    attributes: tuple[Attribute, ...]

    def attr(self, name: str) -> Attribute:
        for a in self.attributes:
            if a.name == name:
                return a
        raise KeyError(name)


@dataclass(frozen=True)
class FileFormat:
    """Per-file read options (sources_config.json:465-480) + codebook
    binding (sources_config.json:459-464)."""
    delimiter: str = "\t"
    codebook: str | None = None  # codebook file name, if any


@dataclass
class SourcesConfig:
    entities: tuple[EntityConfig, ...]
    file_formats: dict[str, FileFormat] = field(default_factory=dict)
    #: columns decoded via codebook, per file: {file: [column, ...]}
    codebook_columns: dict[str, list[str]] = field(default_factory=dict)

    def fmt(self, file: str) -> FileFormat:
        return self.file_formats.get(file, FileFormat())


def from_json_dict(cfg: dict) -> SourcesConfig:
    """Parse a sources-config JSON dict (same nesting as the reference's
    file: entity -> attributes -> sources list with file/column/
    date_format; top-level file_format and codebooks maps)."""
    entities = []
    for ename, edef in cfg.get("entities", {}).items():
        attrs = []
        for adef in edef.get("attributes", []):
            sources = tuple(
                SourceRef(file=s["file"], column=s.get("column"),
                          date_format=s.get("date_format"))
                for s in adef.get("sources", []))
            attrs.append(Attribute(name=adef["name"],
                                   kind=adef.get("kind", "text"),
                                   sources=sources))
        entities.append(EntityConfig(name=ename, id_attr=edef["id_attribute"],
                                     attributes=tuple(attrs)))
    file_formats = {
        f: FileFormat(delimiter=d.get("delimiter", "\t"),
                      codebook=d.get("codebook"))
        for f, d in cfg.get("file_format", {}).items()}
    codebook_columns = {f: list(cols)
                        for f, cols in cfg.get("codebook_columns", {}).items()}
    return SourcesConfig(entities=tuple(entities), file_formats=file_formats,
                         codebook_columns=codebook_columns)
