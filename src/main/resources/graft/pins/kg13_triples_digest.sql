SELECT CAST("pred" AS VARCHAR) AS "pred", CAST("n_rows" AS BIGINT) AS "n_rows", CAST("n_docs" AS BIGINT) AS "n_docs", CAST("row_hash_sum" AS BIGINT) AS "row_hash_sum"
FROM (VALUES
  ('affiliatedWith', 486, 7, 213551242141089),
  ('hasAbstract', 100, 7, 30195011434073),
  ('hasAuthor', 328, 7, 176257125160278),
  ('hasContactEmail', 74, 3, 55307205145648),
  ('hasContribution', 14, 1, 10458480109224),
  ('hasCreditRole', 56, 2, 20411302836414),
  ('hasDOI', 72, 5, 45458703758505),
  ('hasEqualContribution', 14, 1, 8626257461430),
  ('hasFunding', 28, 1, 17037282118948),
  ('hasNote', 28, 1, 15852025830564),
  ('hasRole', 328, 7, 119511441429853),
  ('hasTitle', 100, 7, 38241874540627),
  ('isCorresponding', 116, 6, 46081195848183),
  ('locatedIn', 241, 6, 116764951075667),
  ('publishedIn', 100, 7, 45957477616831),
  ('publishedOn', 100, 7, 52134363081833)
) AS t("pred", "n_rows", "n_docs", "row_hash_sum")
ORDER BY "pred", "n_rows", "n_docs", "row_hash_sum"
