"""Plugin-surface workload (SURVEY §2.10 X1/X2/X4): the profile-hook
resolvers and the HED parser exercised as declared queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.functions.hed import hed_parse_udf
from loris_mri_spark.plugins import resolve_session_config
from loris_mri_spark.workload import query

# Synthetic patient ids derived deterministically from customer keys —
# every 50th scan is a phantom (the reference's lego phantom uploads).
_PID = (
    "CASE WHEN c_custkey % 50 = 0 THEN 'lego_phantom_' || c_custkey "
    "ELSE 'PRJ' || c_nationkey || '_' || c_custkey || '_V' "
    "|| (c_custkey % 3 + 1) END"
)


@query(
    "x1_session_config_hook",
    oracle=f"""
    WITH scans AS (SELECT c_custkey, {_PID} AS patient_id FROM customer)
    SELECT c_custkey, patient_id,
           CASE WHEN patient_id LIKE 'lego_phantom%' THEN NULL
                ELSE split_part(patient_id, '_', 1) END AS project,
           CASE WHEN patient_id LIKE 'lego_phantom%' THEN NULL
                ELSE split_part(patient_id, '_', 2) END AS candidate,
           CASE WHEN patient_id LIKE 'lego_phantom%' THEN 'PHANTOM'
                ELSE split_part(patient_id, '_', 3) END AS visit_label,
           patient_id LIKE 'lego_phantom%' AS is_phantom
    FROM scans
    """,
)
def x1_session_config_hook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: the get_session_config profile hook (`get_session_info.py:
    87-163`) — candidate/visit/phantom routing through the registered
    'default' resolver plugin."""
    c = load_table(spark, sf_dir, "customer")
    scans = c.select("c_custkey", F.expr(_PID).alias("patient_id"))
    return resolve_session_config(scans, "patient_id", profile="default")


@query(
    "x2_legacy_profile_hook",
    oracle="""
    WITH scans AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 4 = 0 THEN 'OTT' || c_custkey
                  ELSE 'MTL' || c_custkey || '_V' || (c_custkey % 2 + 1)
             END AS patient_id
      FROM customer)
    SELECT c_custkey, patient_id,
           regexp_extract(patient_id, '^([A-Za-z]+)', 1) AS project,
           regexp_extract(patient_id, '([0-9]+)', 1) AS candidate,
           COALESCE(NULLIF(regexp_extract(patient_id, '_(V[0-9]+)$', 1), ''),
                    'V1') AS visit_label,
           FALSE AS is_phantom
    FROM scans
    """,
)
def x2_legacy_profile_hook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: the Perl-profile determineSubjectID customization
    (`MRIProcessingUtility.pm:395-480`) as an alternate registered
    resolver — same hook surface, different site logic (visit defaults
    to V1 when the id carries none)."""
    c = load_table(spark, sf_dir, "customer")
    scans = c.select(
        "c_custkey",
        F.expr(
            "CASE WHEN c_custkey % 4 = 0 THEN 'OTT' || c_custkey "
            "ELSE 'MTL' || c_custkey || '_V' || (c_custkey % 2 + 1) END"
        ).alias("patient_id"),
    )
    return resolve_session_config(scans, "patient_id", profile="legacy_perl")


@query(
    "x4_hed_parse",
    oracle="""
    SELECT event_id, 'Sensory-event' AS tag, 0 AS depth, 0 AS item
    FROM events
    UNION ALL
    SELECT event_id, 'Label/' || event_type, 1, 1 FROM events
    UNION ALL
    SELECT event_id,
           'Value/' || json_extract_string(props, '$.k'), 1, 1
    FROM events
    """,
)
def x4_hed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: HED annotation parsing (`lib/physio/hed.py:63-120`): build each
    event's HED string, parse it with the recursive parser UDF, explode
    the flattened (tag, depth, item) node rows. Deeper nesting is
    covered by tests/test_plugins.py."""
    e = load_table(spark, sf_dir, "events")
    hed = e.select(
        "event_id",
        F.concat(
            F.lit("Sensory-event,(Label/"),
            F.col("event_type"),
            F.lit(",Value/"),
            F.get_json_object("props", "$.k"),
            F.lit(")"),
        ).alias("hed"),
    )
    nodes = hed.select(
        "event_id", F.explode(hed_parse_udf(F.col("hed"))).alias("node")
    )
    return nodes.select(
        "event_id",
        F.col("node.tag").alias("tag"),
        F.col("node.depth").alias("depth"),
        F.col("node.item").alias("item"),
    )
