"""Declarative job configuration — the engine's "query language".

Mirrors the reference's YAML surface (ref: config.go:15-75) as typed
dataclasses with the same validation rules (required fields, mode
enum, PK-required-for-diff, duplicate table names, dependency
existence) while staying plain Python so jobs can also be built
programmatically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from mydatasyncer_spark.errors import ConfigError, DependencyError

SYNC_MODE_OVERWRITE = "overwrite"
SYNC_MODE_DIFF = "diff"
_VALID_MODES = (SYNC_MODE_OVERWRITE, SYNC_MODE_DIFF)


@dataclass
class TableSpec:
    """One table's sync job (ref: config.go:37-48).

    ``file_path`` format is dispatched on extension (csv/json/parquet);
    ``dependencies`` are FK parents and drive write ordering.
    """

    name: str
    file_path: str
    primary_key: str = "id"
    columns: list[str] = field(default_factory=list)
    sync_mode: str = SYNC_MODE_DIFF
    delete_not_in_file: bool = False
    timestamp_columns: list[str] = field(default_factory=list)
    immutable_columns: list[str] = field(default_factory=list)
    dependencies: list[str] = field(default_factory=list)
    # >0 enables bucket-pruned diff (operators/diff.diff_snapshots_pruned):
    # the wide diff joins read only key-hash buckets whose fingerprint
    # summaries changed. Pick ~snapshot_size / healthy_partition_size.
    prune_buckets: int = 0

    def validate(self) -> None:
        if not self.name:
            raise ConfigError("table name is required")
        if not self.file_path:
            raise ConfigError(f"table {self.name!r}: filePath is required")
        if self.sync_mode not in _VALID_MODES:
            raise ConfigError(
                f"table {self.name!r}: invalid syncMode {self.sync_mode!r}; "
                f"must be one of {_VALID_MODES}"
            )
        if self.sync_mode == SYNC_MODE_DIFF and not self.primary_key:
            raise ConfigError(
                f"table {self.name!r}: primaryKey is required for diff mode"
            )
        if self.prune_buckets < 0:
            raise ConfigError(
                f"table {self.name!r}: pruneBuckets must be >= 0, got "
                f"{self.prune_buckets}"
            )


@dataclass
class SyncConfig:
    """Whole-job config: one or more tables plus global options.

    Ref: config.go:51-57 (single-table fields collapse into a
    one-element ``tables`` list here — the reference's two shapes are
    one shape for us, with ``is_multi_table`` preserved for parity
    checks, ref: config.go:597-599).
    """

    tables: list[TableSpec]
    jdbc_url: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    dry_run: bool = False
    timeout_seconds: int = 300  # ref: main.go:60-62 — 5-minute global deadline

    @property
    def is_multi_table(self) -> bool:
        return len(self.tables) > 1

    def validate(self) -> None:
        if not self.tables:
            raise ConfigError("at least one table is required")
        seen: set[str] = set()
        for spec in self.tables:
            spec.validate()
            if spec.name in seen:
                # ref: config.go:210-215 — duplicate table names rejected
                raise ConfigError(f"duplicate table name {spec.name!r}")
            seen.add(spec.name)
        for spec in self.tables:
            for dep in spec.dependencies:
                if dep not in seen:
                    raise DependencyError(spec.name, dep, sorted(seen))

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "SyncConfig":
        """Parse the reference's YAML shape (already loaded into a dict).

        Accepts both the single-table shape (``sync:``) and the
        multi-table shape (``sync.tables:``), applying the reference's
        defaults (ref: config.go:59-75).
        """
        sync = raw.get("sync", {}) or {}
        tables_raw = sync.get("tables")
        tables: list[TableSpec] = []
        if tables_raw:
            for t in tables_raw:
                tables.append(_table_from_dict(t, sync))
        else:
            tables.append(
                TableSpec(
                    name=sync.get("tableName", ""),
                    file_path=sync.get("filePath", ""),
                    primary_key=sync.get("primaryKey", "id"),
                    columns=list(sync.get("columns", []) or []),
                    sync_mode=sync.get("syncMode", SYNC_MODE_OVERWRITE),
                    delete_not_in_file=bool(sync.get("deleteNotInFile", False)),
                    timestamp_columns=list(sync.get("timestampColumns", []) or []),
                    immutable_columns=list(sync.get("immutableColumns", []) or []),
                    prune_buckets=int(sync.get("pruneBuckets", 0) or 0),
                )
            )
        cfg = cls(
            tables=tables,
            jdbc_url=(raw.get("db", {}) or {}).get("url"),
            dry_run=bool(raw.get("dryRun", False)),
        )
        cfg.validate()
        return cfg

    @classmethod
    def default(cls) -> "SyncConfig":
        """The reference's built-in default job (ref: config.go:59-75,
        NewDefaultConfig): sync ./testdata.csv into ``products`` on
        ``id`` in diff mode with delete-not-in-file on."""
        return cls(
            tables=[
                TableSpec(
                    name="products",
                    file_path="./testdata.csv",
                    primary_key="id",
                    columns=["id", "name", "price"],
                    sync_mode=SYNC_MODE_DIFF,
                    delete_not_in_file=True,
                )
            ]
        )

    @classmethod
    def from_yaml(cls, path: str, strict: bool = True) -> "SyncConfig":
        """Load the reference's YAML config file directly.

        ``strict=True`` (default, a deliberate improvement over the
        reference) raises :class:`ConfigError` on a missing or
        unparsable file — a typo'd path must not silently sync the
        default job. ``strict=False`` reproduces the reference's
        behavior exactly (ref: config.go:79-113, LoadConfig): empty
        path defaults to ``mydatasyncer.yml``; a missing or unparsable
        file warns and continues with :meth:`default`.
        """
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ConfigError(
                "pyyaml is required for YAML configs; pass a dict to "
                "from_dict instead"
            ) from exc
        import os
        import warnings

        if not strict and not path:
            path = "mydatasyncer.yml"  # ref: config.go:81-84
        if not os.path.exists(path):
            if strict:
                raise ConfigError(f"config file not found: {path}")
            warnings.warn(
                f"Config file {path!r} not found. Using default "
                "configuration.",
                stacklevel=2,
            )
            return cls.default()
        with open(path, encoding="utf-8") as fh:
            try:
                raw = yaml.safe_load(fh) or {}
            except yaml.YAMLError as exc:
                if strict:
                    raise ConfigError(
                        f"could not parse config file {path}: {exc}"
                    ) from exc
                warnings.warn(
                    f"Could not parse config file {path!r}: {exc}. Using "
                    "default configuration.",
                    stacklevel=2,
                )
                return cls.default()
        if not isinstance(raw, dict):
            if strict:
                raise ConfigError(
                    f"config root must be a mapping, got {type(raw).__name__}"
                )
            warnings.warn(
                f"Config root of {path!r} is not a mapping. Using default "
                "configuration.",
                stacklevel=2,
            )
            return cls.default()
        return cls.from_dict(raw)


def _table_from_dict(t: dict[str, Any], sync_defaults: dict[str, Any]) -> TableSpec:
    return TableSpec(
        name=t.get("name", ""),
        file_path=t.get("filePath", ""),
        primary_key=t.get("primaryKey", sync_defaults.get("primaryKey", "id")),
        columns=list(t.get("columns", []) or []),
        sync_mode=t.get("syncMode", sync_defaults.get("syncMode", SYNC_MODE_DIFF)),
        delete_not_in_file=bool(
            t.get("deleteNotInFile", sync_defaults.get("deleteNotInFile", False))
        ),
        timestamp_columns=list(t.get("timestampColumns", []) or []),
        immutable_columns=list(t.get("immutableColumns", []) or []),
        dependencies=list(t.get("dependencies", []) or []),
        prune_buckets=int(
            t.get("pruneBuckets", sync_defaults.get("pruneBuckets", 0)) or 0
        ),
    )
