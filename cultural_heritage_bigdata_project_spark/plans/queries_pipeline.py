"""Catalog entry for the reference pipeline re-creation (SURVEY.md §3,
§7 Phase 2): the full raw → cleansed → curated → serving flow, oracle-
checked end to end against one DuckDB CTE chain reproducing the same
derivations and semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipelines import curated
from .catalog import register

_FLOW_ORACLE = """
WITH eu_base AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
              ELSE 'item/' || CAST(o_orderkey AS VARCHAR) END AS guid,
         'Object ' || CAST(o_orderkey AS VARCHAR) AS title,
         CASE WHEN o_orderkey % 89 = 0 THEN NULL
              ELSE 'http://img/' || CAST(o_orderkey AS VARCHAR) END AS image_url,
         CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE o_orderpriority END AS description,
         CASE WHEN o_orderkey % 11 = 0 THEN '' ELSE o_orderstatus END AS creator,
         o_orderkey AS okey
  FROM orders
), eu_dirty AS (
  SELECT *, 1 AS copy FROM eu_base
  UNION ALL
  SELECT *, 2 AS copy FROM eu_base WHERE okey % 13 = 0
), eu_cleansed AS (
  SELECT guid, title, NULLIF(description, '') AS description,
         NULLIF(creator, '') AS creator
  FROM (SELECT *, row_number() OVER (PARTITION BY guid ORDER BY copy, okey) AS rn
        FROM eu_dirty WHERE guid IS NOT NULL AND image_url IS NOT NULL)
  WHERE rn = 1
), ugc_base AS (
  SELECT 'item/' || CAST(event_id % 499 AS VARCHAR) AS guid,
         'u' || CAST(user_id AS VARCHAR) AS user_id,
         CASE WHEN event_id % 4 = 0 THEN NULL ELSE event_type END AS comment,
         '["t' || CAST(event_id % 3 AS VARCHAR) || '","' || event_type || '"]'
           AS tags_json,
         epoch_us(ts) AS ts_us,
         event_id AS eid
  FROM events
), ugc_dirty AS (
  SELECT * FROM ugc_base UNION ALL SELECT * FROM ugc_base WHERE eid % 17 = 0
), ugc_cleansed AS (
  SELECT guid, user_id, comment, tags_json, ts_us
  FROM (SELECT *, row_number() OVER (PARTITION BY guid, user_id, comment, ts_us
                                     ORDER BY tags_json) AS rn
        FROM ugc_dirty)
  WHERE rn = 1
), verdicts AS (
  SELECT 'item/' || CAST(vec_id AS VARCHAR) AS guid,
         CASE WHEN vec_id % 10 = 3 THEN 'pending' ELSE 'validated' END AS status,
         CASE WHEN vec_id % 50 = 0 THEN 'g' || CAST(vec_id % 7 AS VARCHAR)
              ELSE 'solo' || CAST(vec_id AS VARCHAR) END AS grp
  FROM embeddings
), rep AS (
  SELECT guid, min(guid) OVER (PARTITION BY grp) AS rep_guid
  FROM verdicts WHERE status = 'validated'
), ann AS (
  SELECT r.rep_guid, u.user_id, u.ts_us, u.comment, u.tags_json
  FROM ugc_cleansed u JOIN rep r ON u.guid = r.guid
), joined AS (
  SELECT a.rep_guid AS guid, a.user_id, a.ts_us, a.comment, a.tags_json,
         e.title, e.description, e.creator
  FROM ann a JOIN eu_cleansed e ON a.rep_guid = e.guid
), deduped AS (
  SELECT guid, user_id, ts_us, comment, tags_json, title, description, creator
  FROM (SELECT *, row_number() OVER (PARTITION BY guid, user_id, ts_us
                                     ORDER BY comment ASC NULLS FIRST) AS rn
        FROM joined)
  WHERE rn = 1
), meta_only AS (
  SELECT e.guid, NULL::VARCHAR AS user_id, NULL::BIGINT AS ts_us,
         NULL::VARCHAR AS comment, NULL::VARCHAR AS tags_json,
         e.title, e.description, e.creator
  FROM (SELECT DISTINCT rep_guid AS guid FROM rep) ro
  JOIN eu_cleansed e ON ro.guid = e.guid
  WHERE NOT EXISTS (SELECT 1 FROM deduped d WHERE d.guid = ro.guid)
), full_rows AS (
  SELECT * FROM deduped UNION ALL SELECT * FROM meta_only
)
SELECT guid, user_id, ts_us, comment,
       CASE WHEN tags_json IS NULL THEN NULL
            ELSE json_extract_string(tags_json, '$[0]') || ','
                 || json_extract_string(tags_json, '$[1]') END AS tags_str,
       title, description, creator
FROM full_rows
"""


_METRICS_ORACLE = """
WITH eu_base AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
              ELSE 'item/' || CAST(o_orderkey AS VARCHAR) END AS guid,
         CASE WHEN o_orderkey % 89 = 0 THEN NULL
              ELSE 'http://img/' || CAST(o_orderkey AS VARCHAR) END AS image_url,
         o_orderkey AS okey
  FROM orders
), eu_dirty AS (
  SELECT * FROM eu_base
  UNION ALL
  SELECT * FROM eu_base WHERE okey % 13 = 0
), eu_cleansed AS (
  SELECT DISTINCT guid FROM eu_dirty
  WHERE guid IS NOT NULL AND image_url IS NOT NULL
), ugc_base AS (
  SELECT 'item/' || CAST(event_id % 499 AS VARCHAR) AS guid,
         'u' || CAST(user_id AS VARCHAR) AS user_id,
         CASE WHEN event_id % 4 = 0 THEN NULL ELSE event_type END AS comment,
         epoch_us(ts) AS ts_us, event_id AS eid
  FROM events
), ugc_dirty AS (
  SELECT * FROM ugc_base UNION ALL SELECT * FROM ugc_base WHERE eid % 17 = 0
), ugc_cleansed AS (
  SELECT DISTINCT guid, user_id, comment, ts_us FROM ugc_dirty
), verd AS (
  SELECT 'item/' || CAST(vec_id AS VARCHAR) AS guid,
         CASE WHEN vec_id % 10 = 3 THEN 'pending' ELSE 'validated' END AS status
  FROM embeddings
)
SELECT (SELECT count(*) FROM eu_dirty) AS eu_raw_rows,
       (SELECT count(*) FROM eu_cleansed) AS eu_cleansed_rows,
       (SELECT count(*) FROM ugc_dirty) AS ugc_raw_rows,
       (SELECT count(*) FROM ugc_cleansed) AS ugc_cleansed_rows,
       (SELECT count(*) FROM verd WHERE status = 'validated') AS validated_objects,
       (SELECT count(*) FROM ugc_cleansed u
         WHERE EXISTS (SELECT 1 FROM verd v
                       WHERE v.guid = u.guid AND v.status = 'validated'))
         AS annotations_on_validated
"""


@register(
    "pipeline_stage_metrics",
    description="The reference's [METRICHE] stage-count audit as one query "
    "(record counts before/after each transform — SURVEY §5, "
    "join_eu_ugc_qdrant_merge.py:357-360) instead of scattered print()s",
    survey_ref="A1,A2",
    oracle=_METRICS_ORACLE,
)
def pipeline_stage_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators import joins

    eu_raw = curated.derive_eu_raw(spark, sf_dir)
    eu = curated.cleanse_eu(eu_raw)
    ugc_raw = curated.derive_ugc_raw(spark, sf_dir)
    ugc = curated.cleanse_ugc(ugc_raw)
    verd = curated.derive_verdicts(spark, sf_dir)
    validated = verd.filter(F.col("status") == "validated")
    ann_valid = joins.semi_join(ugc, validated.select("guid"), "guid")

    def cnt(df, name):
        return df.agg(F.count(F.lit(1)).alias(name))

    out = (
        cnt(eu_raw, "eu_raw_rows")
        .crossJoin(cnt(eu, "eu_cleansed_rows"))
        .crossJoin(cnt(ugc_raw, "ugc_raw_rows"))
        .crossJoin(cnt(ugc, "ugc_cleansed_rows"))
        .crossJoin(cnt(validated, "validated_objects"))
        .crossJoin(cnt(ann_valid, "annotations_on_validated"))
    )
    return out


@register(
    "reference_curated_flow",
    description="Full reference pipeline re-creation: dirty raw metadata + "
    "JSON annotation envelopes + dedup verdicts → cleanse (P3/P4/A5) → "
    "validated filter + canonical re-key (P6/U1/M4) → metadata join (J1/J3) "
    "→ split/union (P8/X1) → 3-key dedup (A5) → serving projection with "
    "array repair (F1) — SURVEY.md §3.3 end to end",
    survey_ref="S2,P2,P3,P4,A5,P6,J1,J3,J5,U1,M4,P8,X1,F1",
    oracle=_FLOW_ORACLE,
)
def reference_curated_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curated.curated_flow(spark, sf_dir)
