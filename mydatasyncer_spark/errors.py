"""Typed errors mirroring the reference's rich validation surface.

The reference (config.go:221-365) invests heavily in actionable error
messages — missing dependencies list the available tables, cycles are
reported as a concrete path. We keep that ergonomics.
"""

from __future__ import annotations


class SyncError(Exception):
    """Base class for all engine errors."""


class ConfigError(SyncError):
    """Invalid or incomplete job configuration (ref: config.go:142-218)."""


class DependencyError(ConfigError):
    """Unknown dependency: names available tables (ref: config.go:255-279)."""

    def __init__(self, table: str, missing: str, available: list[str]):
        self.table = table
        self.missing = missing
        self.available = sorted(available)
        super().__init__(
            f"table {table!r} depends on undefined table {missing!r}; "
            f"available tables: {', '.join(self.available)}"
        )


class CycleError(ConfigError):
    """Dependency cycle, reported as a concrete path (ref: config.go:398-456)."""

    def __init__(self, cycle: list[str]):
        self.cycle = cycle
        super().__init__("dependency cycle detected: " + " -> ".join(cycle))


class SchemaError(SyncError):
    """Column resolution failure (ref: dbsync.go:282-344)."""


class PrimaryKeyMissingError(SchemaError):
    """Configured PK not in the resolved sync columns (ref: dbsync.go:310-315)."""

    def __init__(self, pk: str, columns: list[str]):
        self.pk = pk
        self.columns = columns
        super().__init__(
            f"primary key column {pk!r} not found in sync columns {columns!r}"
        )


class ValidationError(SyncError):
    """Strict-mode primary-key validation failure (ref: primary_key_validator.go:57-136)."""

    def __init__(self, message: str, report: object | None = None):
        self.report = report
        super().__init__(message)
