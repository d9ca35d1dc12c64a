SELECT CAST("repo" AS VARCHAR) AS "repo", CAST("path" AS VARCHAR) AS "path", CAST("lang" AS VARCHAR) AS "lang", CAST("error" AS VARCHAR) AS "error"
FROM (VALUES
  ('repo-x', 'empty.md', 'aps-md', 'no paper body found'),
  ('repo-x', 'mystery.bin', 'pdf-scan', 'unknown shape tag: pdf-scan')
) AS t("repo", "path", "lang", "error")
ORDER BY "repo", "path", "lang", "error"
