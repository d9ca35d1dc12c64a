SELECT CAST("has_title" AS BOOLEAN) AS "has_title", CAST("has_abstract" AS BOOLEAN) AS "has_abstract", CAST("has_authors" AS BOOLEAN) AS "has_authors", CAST("author_count" AS INTEGER) AS "author_count", CAST("n_docs" AS BIGINT) AS "n_docs"
FROM (VALUES
  (TRUE, TRUE, TRUE, 2, 1),
  (TRUE, TRUE, TRUE, 3, 4),
  (TRUE, TRUE, TRUE, 4, 1),
  (TRUE, TRUE, TRUE, 5, 1)
) AS t("has_title", "has_abstract", "has_authors", "author_count", "n_docs")
ORDER BY "has_title", "has_abstract", "has_authors", "author_count", "n_docs"
