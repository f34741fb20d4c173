-- GOLDEN: full staged multi-table diff sync in the ANSI fallback
-- dialect (Derby, Oracle): CTAS ... WITH NO DATA staging, scalar-
-- subquery updates guarded by EXISTS. Same plan as
-- mysql_full_sync.sql; pinned by tests/test_dialect_golden.py.
CREATE TABLE "stg_insert_customer" AS SELECT "id", "name", "created_at" FROM "customer" WITH NO DATA;
INSERT INTO "stg_insert_customer" ("id", "name", "created_at") VALUES (7, 'O''Hara \ Sons', DATE '2026-08-14');
CREATE TABLE "stg_update_customer" AS SELECT "id", "name", "created_at" FROM "customer" WITH NO DATA;
INSERT INTO "stg_update_customer" ("id", "name", "created_at") VALUES (3, 'Renamed Corp', DATE '2026-01-02');
CREATE TABLE "stg_delete_customer" AS SELECT "id" FROM "customer" WITH NO DATA;
INSERT INTO "stg_delete_customer" ("id") VALUES (9);
CREATE TABLE "stg_insert_order" AS SELECT "id", "customer_id", "select", "total" FROM "order" WITH NO DATA;
INSERT INTO "stg_insert_order" ("id", "customer_id", "select", "total") VALUES (101, 7, 'expedited', 12.5);
CREATE TABLE "stg_update_order" AS SELECT "id", "customer_id", "select", "total" FROM "order" WITH NO DATA;
INSERT INTO "stg_update_order" ("id", "customer_id", "select", "total") VALUES (55, 3, 'standard', 99.0);
CREATE TABLE "stg_delete_order" AS SELECT "id" FROM "order" WITH NO DATA;
INSERT INTO "stg_delete_order" ("id") VALUES (42), (43);
CREATE TABLE "stg_insert_order_line" AS SELECT "id", "order_id", "qty" FROM "order_line" WITH NO DATA;
INSERT INTO "stg_insert_order_line" ("id", "order_id", "qty") VALUES (1001, 101, 3), (1002, 101, 1);
CREATE TABLE "stg_update_order_line" AS SELECT "id", "order_id", "qty" FROM "order_line" WITH NO DATA;
CREATE TABLE "stg_delete_order_line" AS SELECT "id" FROM "order_line" WITH NO DATA;
INSERT INTO "stg_delete_order_line" ("id") VALUES (900);
START TRANSACTION;
DELETE FROM "order_line" WHERE "id" IN (SELECT "id" FROM "stg_delete_order_line");
DELETE FROM "order" WHERE "id" IN (SELECT "id" FROM "stg_delete_order");
DELETE FROM "customer" WHERE "id" IN (SELECT "id" FROM "stg_delete_customer");
INSERT INTO "customer" ("id", "name", "created_at") SELECT "id", "name", "created_at" FROM "stg_insert_customer";
UPDATE "customer" SET "name" = (SELECT s."name" FROM "stg_update_customer" s WHERE s."id" = "customer"."id") WHERE EXISTS (SELECT 1 FROM "stg_update_customer" s WHERE s."id" = "customer"."id");
INSERT INTO "order" ("id", "customer_id", "select", "total") SELECT "id", "customer_id", "select", "total" FROM "stg_insert_order";
UPDATE "order" SET "customer_id" = (SELECT s."customer_id" FROM "stg_update_order" s WHERE s."id" = "order"."id"), "select" = (SELECT s."select" FROM "stg_update_order" s WHERE s."id" = "order"."id"), "total" = (SELECT s."total" FROM "stg_update_order" s WHERE s."id" = "order"."id") WHERE EXISTS (SELECT 1 FROM "stg_update_order" s WHERE s."id" = "order"."id");
INSERT INTO "order_line" ("id", "order_id", "qty") SELECT "id", "order_id", "qty" FROM "stg_insert_order_line";
UPDATE "order_line" SET "order_id" = (SELECT s."order_id" FROM "stg_update_order_line" s WHERE s."id" = "order_line"."id"), "qty" = (SELECT s."qty" FROM "stg_update_order_line" s WHERE s."id" = "order_line"."id") WHERE EXISTS (SELECT 1 FROM "stg_update_order_line" s WHERE s."id" = "order_line"."id");
COMMIT;
DROP TABLE "stg_insert_customer";
DROP TABLE "stg_update_customer";
DROP TABLE "stg_delete_customer";
DROP TABLE "stg_insert_order";
DROP TABLE "stg_update_order";
DROP TABLE "stg_delete_order";
DROP TABLE "stg_insert_order_line";
DROP TABLE "stg_update_order_line";
DROP TABLE "stg_delete_order_line";
