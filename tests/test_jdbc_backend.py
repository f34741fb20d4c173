"""JdbcBackend e2e (Derby embedded) + dialect SQL generation.

The e2e runs the SURVEY.md §4.3 staged apply against an in-memory
Derby database living inside the Spark JVM: Spark's parallel JDBC
writer stages each diff leg (no ``toLocalIterator`` anywhere on the
leg path), then three set-based statements apply over one driver
connection inside a :class:`Transaction` boundary, with
rollback-on-failure all-or-nothing (ref: dbsync.go:915-1011,
dbsync_test.go:928-930).
"""

import uuid

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.sinks.applier import Transaction, stage_and_apply
from mydatasyncer_spark.sinks.dialects import (
    ANSI,
    MYSQL,
    POSTGRES,
    SQLITE,
    get_dialect,
)
from mydatasyncer_spark.sinks.jdbc import JdbcBackend


# --------------------------------------------------------------- dialects
class TestDialectSql:
    def test_sqlite_update_from(self):
        sql = SQLITE.staged_update_sql("t", ["a", "b"], "id", "stg_upd_t")
        assert sql == (
            'UPDATE "t" SET "a" = s."a", "b" = s."b" '
            'FROM "stg_upd_t" AS s WHERE "t"."id" = s."id"'
        )

    def test_postgres_matches_sqlite_style(self):
        assert POSTGRES.update_style == SQLITE.update_style == "update_from"

    def test_mysql_update_join(self):
        sql = MYSQL.staged_update_sql("t", ["a", "b"], "id", "stg_upd_t")
        assert sql == (
            "UPDATE `t` JOIN `stg_upd_t` AS s ON `t`.`id` = s.`id` "
            "SET `t`.`a` = s.`a`, `t`.`b` = s.`b`"
        )

    def test_ansi_scalar_subquery(self):
        sql = ANSI.staged_update_sql("t", ["a"], "id", "stg_upd_t")
        assert sql == (
            'UPDATE "t" SET "a" = (SELECT s."a" FROM "stg_upd_t" s '
            'WHERE s."id" = "t"."id") '
            'WHERE EXISTS (SELECT 1 FROM "stg_upd_t" s '
            'WHERE s."id" = "t"."id")'
        )

    def test_insert_and_delete_shared_shape(self):
        assert MYSQL.staged_insert_sql("t", ["id", "a"], "stg_ins_t") == (
            "INSERT INTO `t` (`id`, `a`) SELECT `id`, `a` FROM `stg_ins_t`"
        )
        assert SQLITE.staged_delete_sql("t", "id", "stg_del_t") == (
            'DELETE FROM "t" WHERE "id" IN (SELECT "id" FROM "stg_del_t")'
        )

    def test_ctas_no_data_variants(self):
        assert SQLITE.create_staging_sql("s", "t", ["id"]).endswith("LIMIT 0")
        assert ANSI.create_staging_sql("s", "t", ["id"]).endswith(
            "WITH NO DATA"
        )

    def test_lookup_aliases(self):
        assert get_dialect("derby") is ANSI
        assert get_dialect("mariadb") is MYSQL
        assert get_dialect("postgresql") is POSTGRES
        assert get_dialect(MYSQL) is MYSQL
        with pytest.raises(ValueError):
            get_dialect("oracle9i")


# ------------------------------------------------------------------- e2e
@pytest.fixture
def derby(spark):
    """Fresh in-memory Derby DB (inside the Spark JVM) with a seeded
    target table, plus a JdbcBackend wired to it."""
    name = f"jdbc_e2e_{uuid.uuid4().hex[:8]}"
    backend = JdbcBackend(
        spark, f"jdbc:derby:memory:{name};create=true", dialect="derby"
    )
    c = backend.conn
    c.execute_update(
        'CREATE TABLE "test_table" ("id" BIGINT PRIMARY KEY, '
        '"name" VARCHAR(64), "value" VARCHAR(64))'
    )
    c.execute_update(
        "INSERT INTO \"test_table\" VALUES (1, 'Alice', 'old'), "
        "(2, 'Bob', 'keep'), (3, 'Carol', 'stale')"
    )
    c.commit()
    yield backend
    backend.close()


def target_rows(backend):
    return sorted(
        backend.conn.query('SELECT "id", "name", "value" FROM "test_table"')
    )


class TestJdbcStagedApply:
    def test_staged_sync_via_spark_writer(self, spark, derby):
        to_insert = spark.createDataFrame(
            [(4, "Dave", "fresh")], "id long, name string, value string"
        )
        to_update = spark.createDataFrame(
            [(1, "Alice", "new")], "id long, name string, value string"
        )
        to_delete = spark.createDataFrame([(3,)], "id long")
        with Transaction(derby.conn):
            stats = stage_and_apply(
                derby,
                "test_table",
                ["id", "name", "value"],
                "id",
                to_insert,
                to_update,
                to_delete,
            )
        assert (stats.inserted, stats.updated, stats.deleted) == (1, 1, 1)
        assert target_rows(derby) == [
            (1, "Alice", "new"),
            (2, "Bob", "keep"),
            (4, "Dave", "fresh"),
        ]
        # staging tables are dropped after apply
        with pytest.raises(Exception):
            derby.conn.query('SELECT * FROM "stg_ins_test_table"')

    def test_large_leg_stays_distributed(self, spark, derby):
        """A multi-partition leg lands via the parallel writer and the
        set-based insert applies it in one statement."""
        big = (
            spark.range(100, 1100)
            .select(
                F.col("id"),
                F.concat(F.lit("n"), F.col("id")).alias("name"),
                F.lit("bulk").alias("value"),
            )
            .repartition(8)
        )
        empty = big.limit(0)
        with Transaction(derby.conn):
            stats = stage_and_apply(
                derby,
                "test_table",
                ["id", "name", "value"],
                "id",
                big,
                empty,
                empty.select("id"),
            )
        assert stats.inserted == 1000
        assert (
            derby.conn.query('SELECT COUNT(*) FROM "test_table"')[0][0]
            == 1003
        )

    def test_rollback_all_or_nothing(self, spark, derby):
        """A PK collision in the insert leg fails the apply; the
        Transaction rolls everything back (ref: dbsync_test.go:928)."""
        before = target_rows(derby)
        dup = spark.createDataFrame(
            [(4, "Dave", "fresh"), (2, "Bob", "dup-pk")],
            "id long, name string, value string",
        )
        empty = dup.limit(0)
        with pytest.raises(Exception):
            with Transaction(derby.conn):
                stage_and_apply(
                    derby,
                    "test_table",
                    ["id", "name", "value"],
                    "id",
                    dup,
                    empty,
                    empty.select("id"),
                )
        assert target_rows(derby) == before

    def test_timestamp_injection_sparkside(self, spark, derby):
        """O9: ts columns are injected as Spark literals before
        staging — set on insert, refreshed on update."""
        derby.conn.execute_update(
            'ALTER TABLE "test_table" ADD COLUMN "updated_at" TIMESTAMP'
        )
        derby.conn.commit()
        to_insert = spark.createDataFrame(
            [(5, "Eve", "fresh")], "id long, name string, value string"
        )
        to_update = spark.createDataFrame(
            [(1, "Alice", "new")], "id long, name string, value string"
        )
        import datetime

        fixed = datetime.datetime(2024, 3, 1, 12, 0, 0)
        with Transaction(derby.conn):
            stage_and_apply(
                derby,
                "test_table",
                ["id", "name", "value"],
                "id",
                to_insert,
                to_update,
                to_insert.limit(0).select("id"),
                timestamp_columns=["updated_at"],
                now_fn=lambda: fixed,
            )
        got = derby.conn.query(
            'SELECT "id", "updated_at" FROM "test_table" '
            'WHERE "id" IN (1, 5) ORDER BY "id"'
        )
        assert all(ts is not None for _, ts in got)
        untouched = derby.conn.query(
            'SELECT "updated_at" FROM "test_table" WHERE "id" = 2'
        )
        assert untouched[0][0] is None

    def test_read_snapshot_partitioned(self, spark, derby):
        snap = derby.read_snapshot(
            spark,
            "test_table",
            ["id", "name", "value"],
            partition_column='"id"',
            num_partitions=2,
            lower_bound=1,
            upper_bound=4,
        )
        assert snap.rdd.getNumPartitions() == 2
        assert sorted(tuple(r) for r in snap.collect()) == target_rows(derby)

    def test_table_columns(self, derby):
        assert derby.table_columns("test_table") == ["id", "name", "value"]


# ------------------------------------------------- staged Syncer e2e
@pytest.fixture
def derby_fk(spark):
    """Derby DB with an enforced FK pair, for the staged two-phase
    multi-table sync (ref: executeMultiTableSync, dbsync.go:1068-98)."""
    name = f"jdbc_fk_{uuid.uuid4().hex[:8]}"
    backend = JdbcBackend(
        spark, f"jdbc:derby:memory:{name};create=true", dialect="derby"
    )
    c = backend.conn
    c.execute_update(
        'CREATE TABLE "categories" ("id" BIGINT PRIMARY KEY, '
        '"name" VARCHAR(64))'
    )
    c.execute_update(
        'CREATE TABLE "products" ("id" BIGINT PRIMARY KEY, '
        '"name" VARCHAR(64), "category_id" BIGINT '
        'REFERENCES "categories"("id"))'
    )
    c.execute_update("INSERT INTO \"categories\" VALUES (1, 'a'), (2, 'b')")
    c.execute_update(
        "INSERT INTO \"products\" VALUES (10, 'p1', 1), (20, 'p2', 2)"
    )
    c.commit()
    yield backend
    backend.close()


def _fk_config(tmp_path, cat_rows, prod_rows):
    from mydatasyncer_spark.config import SyncConfig, TableSpec

    cat = tmp_path / "cat.csv"
    cat.write_text("id,name\n" + "".join(f"{i},{n}\n" for i, n in cat_rows))
    prod = tmp_path / "prod.csv"
    prod.write_text(
        "id,name,category_id\n"
        + "".join(f"{i},{n},{c}\n" for i, n, c in prod_rows)
    )
    return SyncConfig(
        tables=[
            TableSpec(
                name="products",
                file_path=str(prod),
                primary_key="id",
                sync_mode="diff",
                delete_not_in_file=True,
                dependencies=["categories"],
            ),
            TableSpec(
                name="categories",
                file_path=str(cat),
                primary_key="id",
                sync_mode="diff",
                delete_not_in_file=True,
            ),
        ]
    )


class TestStagedSyncer:
    def test_staged_fk_two_phase(self, spark, derby_fk, tmp_path):
        """Full staged sync: category 2 + product 20 vanish, category
        3 + product 30 arrive — deletes child→parent, inserts
        parent→child, all legs staged by Spark's JDBC writer, one
        global transaction over the applies."""
        from mydatasyncer_spark.syncer import sync

        cfg = _fk_config(
            tmp_path, [(1, "a"), (3, "c")], [(10, "p1", 1), (30, "p3", 3)]
        )
        out = sync(spark, derby_fk, cfg, staging=True)
        assert sorted(
            derby_fk.conn.query('SELECT "id", "name" FROM "categories"')
        ) == [(1, "a"), (3, "c")]
        assert sorted(
            derby_fk.conn.query(
                'SELECT "id", "name", "category_id" FROM "products"'
            )
        ) == [(10, "p1", 1), (30, "p3", 3)]
        assert out.stats["categories"].inserted == 1
        assert out.stats["categories"].deleted == 1
        assert out.stats["products"].inserted == 1
        assert out.stats["products"].deleted == 1
        # staging fully cleaned up
        for stg in ("stg_ins_products", "stg_upd_products", "stg_del_products"):
            with pytest.raises(Exception):
                derby_fk.conn.query(f'SELECT * FROM "{stg}"')

    def test_staged_rollback_all_or_nothing(self, spark, derby_fk, tmp_path):
        """An FK violation in the last staged apply rolls back every
        table's deletes and inserts (ref: dbsync_test.go:928-930)."""
        from mydatasyncer_spark.syncer import sync

        before_cat = sorted(
            derby_fk.conn.query('SELECT "id", "name" FROM "categories"')
        )
        before_prod = sorted(
            derby_fk.conn.query(
                'SELECT "id", "name", "category_id" FROM "products"'
            )
        )
        cfg = _fk_config(
            tmp_path,
            [(1, "a"), (3, "c")],
            [(10, "p1", 1), (30, "p3", 99)],  # category 99 doesn't exist
        )
        with pytest.raises(Exception):
            sync(spark, derby_fk, cfg, staging=True)
        assert (
            sorted(derby_fk.conn.query('SELECT "id", "name" FROM "categories"'))
            == before_cat
        )
        assert (
            sorted(
                derby_fk.conn.query(
                    'SELECT "id", "name", "category_id" FROM "products"'
                )
            )
            == before_prod
        )

    def test_staged_update_and_overwrite(self, spark, derby, tmp_path):
        """Staged diff detects an update cross-type (string CSV vs
        BIGINT DB), and staged overwrite truncates + reloads."""
        from mydatasyncer_spark.config import SyncConfig, TableSpec
        from mydatasyncer_spark.syncer import sync

        f = tmp_path / "t.csv"
        f.write_text(
            "id,name,value\n1,Alice,new\n2,Bob,keep\n4,Dave,fresh\n"
        )
        cfg = SyncConfig(
            tables=[
                TableSpec(
                    name="test_table",
                    file_path=str(f),
                    primary_key="id",
                    sync_mode="diff",
                    delete_not_in_file=True,
                )
            ]
        )
        out = sync(spark, derby, cfg, staging=True)
        assert target_rows(derby) == [
            (1, "Alice", "new"),
            (2, "Bob", "keep"),
            (4, "Dave", "fresh"),
        ]
        st = out.stats["test_table"]
        assert (st.inserted, st.updated, st.deleted) == (1, 1, 1)

        f2 = tmp_path / "t2.csv"
        f2.write_text("id,name,value\n7,Zed,only\n")
        cfg2 = SyncConfig(
            tables=[
                TableSpec(
                    name="test_table",
                    file_path=str(f2),
                    primary_key="id",
                    sync_mode="overwrite",
                )
            ]
        )
        sync(spark, derby, cfg2, staging=True)
        assert target_rows(derby) == [(7, "Zed", "only")]


class TestStagedEmptyPolicies:
    """O11 empty-input matrix holds on the staged path too
    (ref: dbsync.go:409-420, 447-459)."""

    def _cfg(self, tmp_path, delete, mode="diff"):
        from mydatasyncer_spark.config import SyncConfig, TableSpec

        f = tmp_path / "empty.csv"
        f.write_text("")  # empty snapshot
        return SyncConfig(
            tables=[
                TableSpec(
                    name="test_table",
                    file_path=str(f),
                    primary_key="id",
                    sync_mode=mode,
                    delete_not_in_file=delete,
                )
            ]
        )

    def test_empty_diff_without_delete_is_noop(self, spark, derby, tmp_path):
        from mydatasyncer_spark.syncer import sync

        before = target_rows(derby)
        sync(spark, derby, self._cfg(tmp_path, delete=False), staging=True)
        assert target_rows(derby) == before

    def test_empty_diff_with_delete_wipes(self, spark, derby, tmp_path):
        from mydatasyncer_spark.syncer import sync

        out = sync(spark, derby, self._cfg(tmp_path, delete=True), staging=True)
        assert target_rows(derby) == []
        assert out.stats["test_table"].deleted == 3

    def test_empty_overwrite_wipes(self, spark, derby, tmp_path):
        from mydatasyncer_spark.syncer import sync

        sync(
            spark,
            derby,
            self._cfg(tmp_path, delete=False, mode="overwrite"),
            staging=True,
        )
        assert target_rows(derby) == []
