SELECT CAST("kind" AS VARCHAR) AS "kind", CAST("name" AS VARCHAR) AS "name", CAST("canonicalName" AS VARCHAR) AS "canonicalName"
FROM (VALUES
  ('inst', 'University of Oslo', 'University of Oslo'),
  ('inst', 'University of Oxford', 'University of Oslo'),
  ('inst', 'Westlake Institute for Advanced Study', 'Westlake Institute for Advanced Study'),
  ('inst', 'Westlake University', 'Westlake Institute for Advanced Study'),
  ('venue', 'Phys. Rev. Research', 'Phys. Rev. Research'),
  ('venue', 'Physical Review B', 'Physical Review B'),
  ('venue', 'Physical Review Letters', 'Physical Review B'),
  ('venue', 'Physical Review Research', 'Phys. Rev. Research')
) AS t("kind", "name", "canonicalName")
ORDER BY "kind", "name", "canonicalName"
