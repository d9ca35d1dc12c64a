SELECT CAST("stage" AS VARCHAR) AS "stage", CAST("snapshot" AS VARCHAR) AS "snapshot", CAST("n_rows" AS BIGINT) AS "n_rows", CAST("has_partitions" AS BOOLEAN) AS "has_partitions", CAST("resumed" AS BOOLEAN) AS "resumed"
FROM (VALUES
  ('entities', 'fixture-30', 45, TRUE, TRUE),
  ('ingest', 'fixture-30', 30, TRUE, TRUE),
  ('records', 'fixture-30', 30, TRUE, TRUE),
  ('triples', 'fixture-30', 655, TRUE, TRUE)
) AS t("stage", "snapshot", "n_rows", "has_partitions", "resumed")
ORDER BY "stage", "snapshot", "n_rows", "has_partitions", "resumed"
