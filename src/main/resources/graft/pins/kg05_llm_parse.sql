SELECT CAST("id" AS BIGINT) AS "id", CAST("news_intro" AS VARCHAR) AS "news_intro", CAST("first_corr_affils" AS VARCHAR) AS "first_corr_affils", CAST("other_affils" AS VARCHAR) AS "other_affils", CAST("countries" AS VARCHAR) AS "countries", CAST("url" AS VARCHAR) AS "url", CAST("paper_title" AS VARCHAR) AS "paper_title"
FROM (VALUES
  (1, '这是一段新闻介绍。', '洛桑联邦理工学院*', '洛桑联邦理工学院', '瑞士', 'https://www.nature.com/articles/s41567-025-02944-3', 'Predicting topological entanglement entropy in a Rydberg analogue simulator'),
  (2, 'N/A', 'N/A', 'N/A', 'N/A', 'N/A', 'N/A')
) AS t("id", "news_intro", "first_corr_affils", "other_affils", "countries", "url", "paper_title")
ORDER BY "id", "news_intro", "first_corr_affils", "other_affils", "countries", "url", "paper_title"
