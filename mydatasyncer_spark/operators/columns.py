"""Sync-column resolution: the triple intersection.

effective columns = (file columns ∩ db columns) ∩ (config filter, if
non-empty), preserving file-column order, deduplicated, with the
primary key asserted present (ref: dbsync.go:282-344). The file side
is sorted first for determinism (ref: dbsync.go:436, 1134-1138).

Pure Python over ``df.columns`` — the result then drives a
``df.select(*cols)`` so Catalyst prunes the scan to exactly these
columns (visible as ReadSchema in .explain).
"""

from __future__ import annotations

from mydatasyncer_spark.errors import PrimaryKeyMissingError, SchemaError


def find_common_columns(file_cols: list[str], db_cols: list[str]) -> list[str]:
    """file ∩ db, in sorted-file-column order, deduplicated
    (ref: findCommonColumns, dbsync.go:282-292)."""
    db_set = set(db_cols)
    seen: set[str] = set()
    out: list[str] = []
    for c in sorted(file_cols):
        if c in db_set and c not in seen:
            seen.add(c)
            out.append(c)
    return out


def filter_columns_by_config(
    common: list[str], config_cols: list[str]
) -> list[str]:
    """Apply the optional config allow-list, preserving ``common``'s
    order (ref: filterColumnsByConfig, dbsync.go:295-307)."""
    if not config_cols:
        return list(common)
    allowed = set(config_cols)
    return [c for c in common if c in allowed]


def determine_sync_columns(
    file_cols: list[str],
    db_cols: list[str],
    config_cols: list[str],
    primary_key: str,
) -> list[str]:
    """Full pipeline with the reference's exact error cases
    (ref: determineActualSyncColumns, dbsync.go:321-344).

    Empty-file special case: with no file columns at all, fall back to
    all DB columns (ref: dbsync.go:447-459).
    """
    if not file_cols:
        cols = filter_columns_by_config(list(db_cols), config_cols)
    else:
        common = find_common_columns(file_cols, db_cols)
        if not common:
            raise SchemaError(
                f"no common columns between file {sorted(file_cols)!r} "
                f"and db {sorted(db_cols)!r}"
            )
        cols = filter_columns_by_config(common, config_cols)
    if not cols:
        raise SchemaError("column config filtered out every common column")
    if primary_key not in cols:
        raise PrimaryKeyMissingError(primary_key, cols)
    return cols


def schema_drift(
    old_schema: "list[tuple[str, str]] | object",
    new_schema: "list[tuple[str, str]] | object",
) -> list[dict]:
    """Structured drift report between two snapshot schemas: one entry
    per added / removed / retyped column, empty when identical.

    Accepts either ``[(name, type_string), ...]`` pairs or Spark
    ``StructType`` objects (e.g. ``df.schema``). Pure metadata — the
    natural pre-sync guard: a non-empty report means the file snapshot
    no longer matches what the triple intersection silently narrows
    to, so surface it instead of syncing a truncated column set.

    Entries: ``{"column", "status", "old_type", "new_type"}`` with
    status ∈ {"added", "removed", "type_changed"}; deterministic
    (sorted by column name).
    """

    def _pairs(s):
        if hasattr(s, "fields"):  # StructType
            return [(f.name, f.dataType.simpleString()) for f in s.fields]
        return [(n, str(t)) for n, t in s]

    old = dict(_pairs(old_schema))
    new = dict(_pairs(new_schema))
    report: list[dict] = []
    for name in sorted(old.keys() | new.keys()):
        if name not in new:
            report.append(
                {"column": name, "status": "removed",
                 "old_type": old[name], "new_type": None}
            )
        elif name not in old:
            report.append(
                {"column": name, "status": "added",
                 "old_type": None, "new_type": new[name]}
            )
        elif old[name] != new[name]:
            report.append(
                {"column": name, "status": "type_changed",
                 "old_type": old[name], "new_type": new[name]}
            )
    return report
