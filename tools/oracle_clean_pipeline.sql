-- DuckDB oracle for q_clean_pipeline: the reference pipeline unrolled as
-- literal SQL over the bundled fixture TSVs (VERDICT.md next-round #1).
-- Dictionary plan for these fixtures (data-independent): drop AGENCY_NAME
-- (clean name 'NOT USED - drop me') and JUNK_COL (no dictionary match),
-- rename AGENCY_CODE -> "Agency Code"; everything else identity.
WITH lunch_raw AS (
  SELECT "AGENCY_CODE" AS "Agency Code", "school name", "claim date",
         "district id", "School ID", "PUBLIC", "SCHOOL TYPE",
         "School Level-Original", "CEP (Y/N)", "Lunch Meals-Free",
         "Lunch Meals-Reduced", "Lunch Meals-Free and Reduced",
         "Lunch Meals-Paid", "Operating Days-Lunch Only", "Operating Days",
         "Enrollment-Free", "Enrollment-Reduced",
         "Enrollment-Free and Reduced", "Enrollment-Total", "School Year"
  FROM read_csv('/root/repo/src/main/resources/fixtures/2017_2018_NSLP_MEAL_PARTICIPATION.txt',
                delim='\t', header=true, all_varchar=true)
),
lunch1 AS (
  SELECT *,
    CASE WHEN "PUBLIC" = 'YES' AND "SCHOOL TYPE" <> 'RCCI' THEN 'Public'
         WHEN "PUBLIC" = 'YES' AND "SCHOOL TYPE" = 'RCCI' THEN 'Public-RCCI'
         WHEN "PUBLIC" = 'NO'  AND "SCHOOL TYPE" <> 'RCCI' THEN 'Nonpublic'
         WHEN "PUBLIC" = 'NO'  AND "SCHOOL TYPE" = 'RCCI' THEN 'Nonpublic-RCCI'
         ELSE NULL END AS "School Type-Original",
    COALESCE(CAST("Lunch Meals-Free" AS DOUBLE) + CAST("Lunch Meals-Reduced" AS DOUBLE),
             CAST("Lunch Meals-Free and Reduced" AS DOUBLE)) AS "FR Lunch Meals",
    COALESCE(CAST("Enrollment-Free" AS DOUBLE) + CAST("Enrollment-Reduced" AS DOUBLE),
             CAST("Enrollment-Free and Reduced" AS DOUBLE)) AS "FR Enrollment"
  FROM lunch_raw
),
lunch2 AS (
  SELECT *,
    "FR Lunch Meals" / NULLIF(COALESCE(CAST("Operating Days-Lunch Only" AS DOUBLE),
                                       CAST("Operating Days" AS DOUBLE)), 0.0)
      AS "FR Lunch ADP",
    'WI' || '-' || ('0' || "School ID") || '-' || "district id" AS "Unique ID",
    LPAD("district id", 6, '0') AS "NCES ID",
    COALESCE("School Year", '17-18') AS "School_Year",
    CAST(NULL AS VARCHAR) AS "Target Area",
    CASE WHEN "CEP (Y/N)" = 'N'
           THEN "FR Enrollment" / NULLIF(CAST("Enrollment-Total" AS DOUBLE), 0.0)
         WHEN "CEP (Y/N)" = 'Y'
           THEN CAST("Enrollment-Free" AS DOUBLE) /
                NULLIF(CAST("Enrollment-Free" AS DOUBLE) + CAST("Lunch Meals-Paid" AS DOUBLE), 0.0)
         ELSE NULL END AS "FR Enrollment Percentage",
    CASE WHEN "School Level-Original" = 'High School' THEN 'High'
         WHEN "School Level-Original" = 'Elementary School' THEN 'Elementary'
         WHEN "School Level-Original" = 'Middle School' THEN 'Middle'
         WHEN "School Level-Original" = 'Junior H.S' THEN 'Middle'
         WHEN "School Level-Original" = 'Elementary/Sec Combined' THEN 'Other'
         WHEN "School Level-Original" = 'RCCI' THEN 'Other'
         WHEN "School Level-Original" = 'Unknown' THEN 'Other'
         WHEN "School Level-Original" IS NULL THEN NULL
         ELSE 'Other' END AS "School Level-Standardized",
    CASE WHEN "School Type-Original" = 'Public' THEN 'Public'
         WHEN "School Type-Original" = 'Nonpublic' THEN 'Private'
         WHEN "School Type-Original" IN ('Public-RCCI', 'Nonpublic-RCCI') THEN 'RCCI'
         ELSE NULL END AS "School Type-Standardized"
  FROM lunch1
),
bf_raw AS (
  SELECT "AGENCY_CODE" AS "Agency Code", "school name", "claim date",
         "district id", "School ID", "TRADITIONAL_MODEL", "MID_MORNING_MODEL",
         "CLASSROOM_MODEL", "REDUCED_PRICE_MODEL", "GRAB_N_GO_MODEL",
         "FREE_MODEL", "Breakfast Meals-Free", "Breakfast Meals-Reduced",
         "Breakfast Meals-Free and Reduced", "Operating Days-Breakfast Only",
         "Operating Days"
  FROM read_csv('/root/repo/src/main/resources/fixtures/2017_2018_SBP_MEAL_PARTICIPATION.txt',
                delim='\t', header=true, all_varchar=true)
),
bf1 AS (
  SELECT *,
    'O=' || COALESCE("TRADITIONAL_MODEL", '') || ', ' ||
    'P=' || COALESCE("MID_MORNING_MODEL", '') || ', ' ||
    'C=' || COALESCE("CLASSROOM_MODEL", '') || ', ' ||
    'R=' || COALESCE("REDUCED_PRICE_MODEL", '') || ', ' ||
    'G=' || COALESCE("GRAB_N_GO_MODEL", '') || ', ' ||
    'T=' || COALESCE("FREE_MODEL", '')
      AS "Breakfast Delivery Model from State Agency-Original",
    COALESCE(CAST("Breakfast Meals-Free" AS DOUBLE) + CAST("Breakfast Meals-Reduced" AS DOUBLE),
             CAST("Breakfast Meals-Free and Reduced" AS DOUBLE)) AS "FR Breakfast Meals"
  FROM bf_raw
),
bf2 AS (
  SELECT *,
    "FR Breakfast Meals" / NULLIF(COALESCE(CAST("Operating Days-Breakfast Only" AS DOUBLE),
                                           CAST("Operating Days" AS DOUBLE)), 0.0)
      AS "FR Breakfast ADP"
  FROM bf1
),
joined AS (
  SELECT
    l."school name", l."claim date",
    l."Agency Code", l."district id", l."School ID", l."PUBLIC",
    l."SCHOOL TYPE", l."School Level-Original", l."CEP (Y/N)",
    l."Lunch Meals-Free", l."Lunch Meals-Reduced",
    l."Lunch Meals-Free and Reduced", l."Lunch Meals-Paid",
    l."Operating Days-Lunch Only", l."Operating Days",
    l."Enrollment-Free", l."Enrollment-Reduced",
    l."Enrollment-Free and Reduced", l."Enrollment-Total", l."School Year",
    l."School Type-Original", l."FR Lunch Meals", l."FR Enrollment",
    l."FR Lunch ADP", l."Unique ID", l."NCES ID", l."School_Year",
    l."Target Area", l."FR Enrollment Percentage",
    l."School Level-Standardized", l."School Type-Standardized",
    b."Agency Code" AS "Agency Code_b", b."district id" AS "district id_b",
    b."School ID" AS "School ID_b", b."TRADITIONAL_MODEL",
    b."MID_MORNING_MODEL", b."CLASSROOM_MODEL", b."REDUCED_PRICE_MODEL",
    b."GRAB_N_GO_MODEL", b."FREE_MODEL", b."Breakfast Meals-Free",
    b."Breakfast Meals-Reduced", b."Breakfast Meals-Free and Reduced",
    b."Operating Days-Breakfast Only", b."Operating Days" AS "Operating Days_b",
    b."Breakfast Delivery Model from State Agency-Original",
    b."FR Breakfast Meals", b."FR Breakfast ADP"
  FROM lunch2 l
  JOIN bf2 b
    ON l."school name" = b."school name"
   AND l."claim date" = b."claim date"
   AND LPAD(l."district id", 6, '0') = LPAD(b."district id", 6, '0')
),
final AS (SELECT DISTINCT * FROM joined)
SELECT "school name", "claim date",
       "Unique ID" AS unique_id, "NCES ID" AS nces_id,
       "FR Lunch Meals" AS fr_lunch_meals, "FR Lunch ADP" AS fr_lunch_adp,
       "FR Breakfast Meals" AS fr_breakfast_meals,
       "School Level-Standardized" AS school_level_std
FROM final ORDER BY "school name"
