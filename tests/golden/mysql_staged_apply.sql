-- GOLDEN: exact statement sequence the MySQL dialect emits for
-- one staged diff apply (create staging x3, set-based apply x3,
-- drop staging x3). Regenerated + byte-compared by
-- tests/test_dialect_golden.py -- any change to the emitted SQL
-- must be reviewed against MySQL 8.0 grammar and re-committed.

-- case 1: plain identifiers
CREATE TABLE `stg_insert_sync_target` AS SELECT `id`, `name`, `value`, `updated_at` FROM `sync_target` LIMIT 0;
CREATE TABLE `stg_update_sync_target` AS SELECT `id`, `name`, `value`, `updated_at` FROM `sync_target` LIMIT 0;
CREATE TABLE `stg_delete_sync_target` AS SELECT `id` FROM `sync_target` LIMIT 0;
INSERT INTO `sync_target` (`id`, `name`, `value`, `updated_at`) SELECT `id`, `name`, `value`, `updated_at` FROM `stg_insert_sync_target`;
UPDATE `sync_target` JOIN `stg_update_sync_target` AS s ON `sync_target`.`id` = s.`id` SET `sync_target`.`name` = s.`name`, `sync_target`.`value` = s.`value`, `sync_target`.`updated_at` = s.`updated_at`;
DELETE FROM `sync_target` WHERE `id` IN (SELECT `id` FROM `stg_delete_sync_target`);
DROP TABLE `stg_insert_sync_target`;
DROP TABLE `stg_update_sync_target`;
DROP TABLE `stg_delete_sync_target`;

-- case 2: hostile identifiers (reserved word, space, embedded backtick)
CREATE TABLE `stg_insert_order` AS SELECT `id`, `select`, `col name`, `wei``rd` FROM `order` LIMIT 0;
CREATE TABLE `stg_update_order` AS SELECT `id`, `select`, `col name`, `wei``rd` FROM `order` LIMIT 0;
CREATE TABLE `stg_delete_order` AS SELECT `id` FROM `order` LIMIT 0;
INSERT INTO `order` (`id`, `select`, `col name`, `wei``rd`) SELECT `id`, `select`, `col name`, `wei``rd` FROM `stg_insert_order`;
UPDATE `order` JOIN `stg_update_order` AS s ON `order`.`id` = s.`id` SET `order`.`select` = s.`select`, `order`.`col name` = s.`col name`, `order`.`wei``rd` = s.`wei``rd`;
DELETE FROM `order` WHERE `id` IN (SELECT `id` FROM `stg_delete_order`);
DROP TABLE `stg_insert_order`;
DROP TABLE `stg_update_order`;
DROP TABLE `stg_delete_order`;
