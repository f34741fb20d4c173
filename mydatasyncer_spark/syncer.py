"""End-to-end sync orchestration (O1-O12).

The lifecycle mirrors the reference's EP1/EP2 entry points
(ref: main.go:59-134, dbsync.go:407-491, 915-1011) with Spark doing
every data-heavy step and the driver sequencing only the transactional
writes:

1. load file snapshots (lazy DataFrames — *all* tables resolved before
   the transaction opens, ref: dbsync.go:936-951);
2. strict PK validation for diff-mode tables (V1);
3. resolve sync columns per table (P4/P5);
4. compute diff triples (J2-J4), persisted so the write transaction
   never waits on a recomputation;
5. dry-run → build plans and stop, zero writes (O8);
6. else apply: single table in insert→update→delete order inside one
   transaction; multi-table in two phases inside ONE global
   transaction — deletes child→parent, then inserts+updates
   parent→child (O5/O7, ref: executeMultiTableSync, dbsync.go:1068-1098).

Empty-input policy (O11, ref: dbsync.go:409-420, 447-459):
- empty file + diff without delete  → no-op;
- empty file + overwrite            → table is wiped;
- empty file + diff with delete     → all DB rows deleted.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from mydatasyncer_spark.config import (
    SYNC_MODE_DIFF,
    SYNC_MODE_OVERWRITE,
    SyncConfig,
    TableSpec,
)
from mydatasyncer_spark.dag import DependencyGraph
from mydatasyncer_spark.errors import SyncError
from mydatasyncer_spark.operators.columns import determine_sync_columns
from mydatasyncer_spark.operators.diff import (
    DiffResult,
    diff_snapshots,
    diff_snapshots_pruned,
)
from mydatasyncer_spark.operators.validation import validate_primary_keys
from mydatasyncer_spark.plans.dryrun import ExecutionPlan, build_plan
from mydatasyncer_spark.sinks.applier import (
    ApplyStats,
    DbApiBackend,
    StagedLegs,
    Transaction,
    apply_diff,
    apply_staged_deletes,
    apply_staged_upserts,
    drop_staged,
    overwrite_table,
    stage_legs,
)
from mydatasyncer_spark.sources.readers import coerce_rfc3339, read_file


@dataclass
class SyncOutcome:
    stats: dict[str, ApplyStats] = field(default_factory=dict)
    plans: dict[str, ExecutionPlan] = field(default_factory=dict)

    @property
    def dry_run(self) -> bool:
        return bool(self.plans)


@dataclass
class _Prepared:
    spec: TableSpec
    sync_columns: list[str]
    file_df: DataFrame
    db_df: DataFrame
    diff: DiffResult | None
    file_empty: bool


class Syncer:
    """``staging=True`` switches the write path from the per-row
    batched apply to the SURVEY.md §4.3 staged design: every diff leg
    lands in a staging table first (Spark's parallel JDBC writer under
    a :class:`~mydatasyncer_spark.sinks.jdbc.JdbcBackend` — no row
    crosses the Python driver), staging and cleanup happen OUTSIDE
    the global transaction (MySQL DDL implicit-commits), and the
    transaction wraps only the set-based applies in the two-phase
    order."""

    def __init__(
        self,
        spark: SparkSession,
        backend: DbApiBackend,
        config: SyncConfig,
        staging: bool = False,
    ):
        config.validate()
        self.spark = spark
        self.backend = backend
        self.config = config
        self.staging = staging
        self._deadline = time.monotonic() + config.timeout_seconds

    def _check_deadline(self) -> None:
        # O12: 5-minute global run deadline (ref: main.go:60-62)
        if time.monotonic() > self._deadline:
            raise SyncError(
                f"sync exceeded {self.config.timeout_seconds}s global timeout"
            )

    # ------------------------------------------------------------ pipeline
    def _prepare(self, spec: TableSpec) -> _Prepared:
        """Steps 1-4 for one table — everything distributed, nothing
        inside the write transaction."""
        file_df = coerce_rfc3339(read_file(self.spark, spec.file_path))
        file_empty = file_df.isEmpty()
        db_cols = self.backend.table_columns(spec.name)
        cols = determine_sync_columns(
            file_cols=[] if file_empty else file_df.columns,
            db_cols=db_cols,
            config_cols=spec.columns,
            primary_key=spec.primary_key,
        )
        if spec.sync_mode == SYNC_MODE_DIFF and not file_empty:
            validate_primary_keys(file_df, spec.primary_key, strict=True)
        db_df = self.backend.read_snapshot(self.spark, spec.name, cols)
        diff = None
        if spec.sync_mode == SYNC_MODE_DIFF:
            file_proj = (
                file_df.select(*[c for c in cols if c in file_df.columns])
                if not file_empty
                else db_df.limit(0)
            )
            if spec.prune_buckets > 0:
                diff = diff_snapshots_pruned(
                    file_proj,
                    db_df,
                    spec.primary_key,
                    columns=cols,
                    n_buckets=spec.prune_buckets,
                    delete_not_in_file=spec.delete_not_in_file,
                )
            else:
                diff = diff_snapshots(
                    file_proj,
                    db_df,
                    spec.primary_key,
                    columns=cols,
                    delete_not_in_file=spec.delete_not_in_file,
                )
            # persist: the write tx must not re-trigger the scan/join
            diff.to_insert.persist()
            diff.to_update.persist()
            diff.to_delete.persist()
        return _Prepared(spec, cols, file_df, db_df, diff, file_empty)

    def _plan_for(self, prep: _Prepared) -> ExecutionPlan:
        spec = prep.spec
        if spec.sync_mode == SYNC_MODE_OVERWRITE:
            file_n = 0 if prep.file_empty else prep.file_df.count()
            db_n = prep.db_df.count()
            # overwrite plan = delete-all + insert-all (ref: dbsync.go:359-370)
            empty = prep.db_df.limit(0)
            to_insert = (
                prep.file_df.select(
                    *[c for c in prep.sync_columns if c in prep.file_df.columns]
                )
                if not prep.file_empty
                else empty
            )
            diff = DiffResult(to_insert, empty, prep.db_df)
            return build_plan(
                spec.name,
                spec.sync_mode,
                spec.primary_key,
                prep.sync_columns,
                diff,
                file_n,
                db_n,
                spec.timestamp_columns,
                spec.immutable_columns,
            )
        return build_plan(
            spec.name,
            spec.sync_mode,
            spec.primary_key,
            prep.sync_columns,
            prep.diff,
            0 if prep.file_empty else prep.file_df.count(),
            prep.db_df.count(),
            spec.timestamp_columns,
            spec.immutable_columns,
        )

    # ------------------------------------------------------------- execute
    def run(self) -> SyncOutcome:
        outcome = SyncOutcome()
        order = [t.name for t in self.config.tables]
        deps = {t.name: list(t.dependencies) for t in self.config.tables}
        graph = DependencyGraph(deps)
        insert_order, delete_order = graph.sync_order()
        specs = {t.name: t for t in self.config.tables}

        # Phase 0: prepare everything outside the transaction
        prepared: dict[str, _Prepared] = {}
        for name in insert_order:
            self._check_deadline()
            prepared[name] = self._prepare(specs[name])

        if self.config.dry_run:
            for name in insert_order:
                outcome.plans[name] = self._plan_for(prepared[name])
            self._unpersist(prepared)
            return outcome

        if self.staging:
            return self._run_staged(
                outcome, prepared, insert_order, delete_order
            )

        try:
            with Transaction(self.backend.conn):
                # Phase A: deletes, child → parent (skip unless
                # diff + deleteNotInFile, ref: dbsync.go:1077-1079)
                for name in delete_order:
                    self._check_deadline()
                    prep = prepared[name]
                    spec = prep.spec
                    stats = outcome.stats.setdefault(name, ApplyStats())
                    if spec.sync_mode == SYNC_MODE_OVERWRITE:
                        continue  # overwrite truncates in phase B
                    if spec.delete_not_in_file and prep.diff is not None:
                        stats.deleted = self.backend.delete_rows(
                            spec.name,
                            spec.primary_key,
                            (
                                (r[spec.primary_key],)
                                for r in prep.diff.to_delete.select(
                                    spec.primary_key
                                ).toLocalIterator()
                            ),
                        )
                # Phase B: inserts + updates, parent → child
                for name in insert_order:
                    self._check_deadline()
                    prep = prepared[name]
                    spec = prep.spec
                    stats = outcome.stats[name]
                    if spec.sync_mode == SYNC_MODE_OVERWRITE:
                        df = (
                            prep.file_df.select(
                                *[c for c in prep.sync_columns if c in prep.file_df.columns]
                            )
                            if not prep.file_empty
                            else prep.db_df.limit(0)
                        )
                        ow = overwrite_table(
                            self.backend,
                            spec.name,
                            prep.sync_columns if not prep.file_empty else [],
                            df,
                            spec.timestamp_columns,
                        )
                        stats.inserted = ow.inserted
                        continue
                    part = apply_diff(
                        self.backend,
                        spec.name,
                        prep.sync_columns,
                        spec.primary_key,
                        prep.diff.to_insert,
                        prep.diff.to_update,
                        prep.diff.to_delete.limit(0),  # deletes done in phase A
                        spec.timestamp_columns,
                        spec.immutable_columns,
                    )
                    stats.inserted, stats.updated = part.inserted, part.updated
        finally:
            self._unpersist(prepared)
        return outcome

    def _run_staged(
        self,
        outcome: SyncOutcome,
        prepared: dict[str, _Prepared],
        insert_order: list[str],
        delete_order: list[str],
    ) -> SyncOutcome:
        """Staged write path: stage everything (no tx) → one global
        transaction over the set-based applies in two-phase order →
        cleanup (no tx)."""
        staged: dict[str, StagedLegs] = {}
        try:
            for name in insert_order:
                self._check_deadline()
                prep = prepared[name]
                spec = prep.spec
                empty = prep.db_df.limit(0)
                if spec.sync_mode == SYNC_MODE_OVERWRITE:
                    to_insert = (
                        prep.file_df.select(
                            *[
                                c
                                for c in prep.sync_columns
                                if c in prep.file_df.columns
                            ]
                        )
                        if not prep.file_empty
                        else empty
                    )
                    to_update, to_delete = empty, empty
                else:
                    to_insert = prep.diff.to_insert
                    to_update = prep.diff.to_update
                    to_delete = (
                        prep.diff.to_delete
                        if spec.delete_not_in_file
                        else empty
                    )
                staged[name] = stage_legs(
                    self.backend,
                    spec.name,
                    prep.sync_columns,
                    spec.primary_key,
                    to_insert,
                    to_update,
                    to_delete,
                    spec.immutable_columns,
                    spec.timestamp_columns,
                    target_schema=prep.db_df.schema,
                )
            with Transaction(self.backend.conn):
                # Phase A: deletes, child → parent
                for name in delete_order:
                    self._check_deadline()
                    spec = prepared[name].spec
                    stats = outcome.stats.setdefault(name, ApplyStats())
                    if spec.sync_mode == SYNC_MODE_OVERWRITE:
                        continue
                    if spec.delete_not_in_file:
                        stats.deleted = apply_staged_deletes(
                            self.backend, staged[name]
                        )
                # Phase B: truncates/inserts/updates, parent → child
                for name in insert_order:
                    self._check_deadline()
                    spec = prepared[name].spec
                    stats = outcome.stats[name]
                    if spec.sync_mode == SYNC_MODE_OVERWRITE:
                        self.backend.truncate(spec.name)
                    ins, upd = apply_staged_upserts(
                        self.backend, staged[name]
                    )
                    stats.inserted, stats.updated = ins, upd
        finally:
            for legs in staged.values():
                drop_staged(self.backend, legs)
            self._unpersist(prepared)
        return outcome

    @staticmethod
    def _unpersist(prepared: dict[str, _Prepared]) -> None:
        for prep in prepared.values():
            if prep.diff is not None:
                prep.diff.to_insert.unpersist()
                prep.diff.to_update.unpersist()
                prep.diff.to_delete.unpersist()


def sync(
    spark: SparkSession,
    backend: DbApiBackend,
    config: SyncConfig,
    staging: bool = False,
) -> SyncOutcome:
    return Syncer(spark, backend, config, staging=staging).run()
