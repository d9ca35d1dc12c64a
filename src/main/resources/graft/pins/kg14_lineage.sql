SELECT CAST("stage" AS VARCHAR) AS "stage", CAST("snapshot" AS VARCHAR) AS "snapshot", CAST("n_rows" AS BIGINT) AS "n_rows", CAST("resumed" AS BOOLEAN) AS "resumed"
FROM (VALUES
  ('entities', 'fixture-30', 45, TRUE),
  ('ingest', 'fixture-30', 30, TRUE),
  ('records', 'fixture-30', 30, TRUE),
  ('triples', 'fixture-30', 655, TRUE)
) AS t("stage", "snapshot", "n_rows", "resumed")
ORDER BY "stage", "snapshot", "n_rows", "resumed"
