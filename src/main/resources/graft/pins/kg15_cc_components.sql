SELECT CAST("size" AS BIGINT) AS "size", CAST("n_components" AS BIGINT) AS "n_components", CAST("canon_hash_sum" AS BIGINT) AS "canon_hash_sum"
FROM (VALUES
  (15, 6704, 3335880868459080),
  (16, 1215, 615477707530326)
) AS t("size", "n_components", "canon_hash_sum")
ORDER BY "size", "n_components", "canon_hash_sum"
