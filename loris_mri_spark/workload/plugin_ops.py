"""Plugin-surface workload (SURVEY §2.10 X1/X2/X4): the profile-hook
resolvers and the HED parser exercised as declared queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.functions.hed import hed_parse_udf
from loris_mri_spark.plugins import resolve_session_config
from loris_mri_spark.workload import query
from loris_mri_spark.workload import shared_df as _shared


def _hed_event_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, node) rows from the parsed per-event HED string — the
    Arrow-UDF parse pass shared by x4_hed_parse and x4b_hed_ancestors
    under spark.loris.sharedCache (see workload.shared_df).

    Component-wise string construction mirroring the oracles' per-branch
    null semantics: a NULL event_type or missing $.k drops ONLY its own
    tag (concat_ws skips nulls) instead of nulling the whole string and
    silently losing the event's other rows — the r03 drift class, guarded
    against a future testdata refresh. On the current corpus (both fields
    always present) the string is byte-identical."""

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "events")
        _k = F.get_json_object("props", "$.k")
        hed = e.select(
            "event_id",
            F.concat(
                F.lit("Sensory-event,("),
                F.concat_ws(
                    ",",
                    F.when(
                        F.col("event_type").isNotNull(),
                        F.concat(F.lit("Label/"), F.col("event_type")),
                    ),
                    F.when(_k.isNotNull(), F.concat(F.lit("Value/"), _k)),
                ),
                F.lit(")"),
            ).alias("hed"),
        )
        return hed.select(
            "event_id", F.explode(hed_parse_udf(F.col("hed"))).alias("node")
        )

    return _shared(spark, ("hed_nodes", sf_dir), build)

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
    WHERE event_type IS NOT NULL
    UNION ALL
    SELECT event_id,
           'Value/' || json_extract_string(props, '$.k'), 1, 1
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def x4_hed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: HED annotation parsing (`lib/physio/hed.py:63-120`): build each
    event's HED string, parse it with the recursive parser UDF, explode
    the flattened (tag, depth, item) node rows. Deeper nesting is
    covered by tests/test_plugins.py."""
    nodes = _hed_event_nodes(spark, sf_dir)
    return nodes.select(
        "event_id",
        F.col("node.tag").alias("tag"),
        F.col("node.depth").alias("depth"),
        F.col("node.item").alias("item"),
    )


# A hed_schema_node-shaped ontology slice (id, name, parent_id) — the
# self-referencing tree the reference walks when assigning parsed HED tags
# to schema nodes (`python/lib/db/models/hed_schema_node.py:7-16`,
# `lib/physio/hed.py:63-120`). Metadata-sized in production (the full HED
# schema is ~2k nodes), so it broadcasts.
_HED_NODES = [
    (1, "Event", None),
    (2, "Sensory-event", 1),
    (3, "Agent-action", 1),
    (4, "Property", None),
    (5, "Informational-property", 4),
    (6, "Label", 5),
    (7, "Parameter", 5),
    (8, "Value", 7),
]

_HED_NODES_SQL = ", ".join(
    f"({i}, '{n}', {p if p is not None else 'CAST(NULL AS INT)'})"
    for i, n, p in _HED_NODES
)


@query(
    "x4b_hed_ancestors",
    oracle=f"""
    WITH RECURSIVE
    nodes(node_id, name, parent_id) AS (VALUES {_HED_NODES_SQL}),
    tags AS (
      SELECT event_id, 'Sensory-event' AS tag FROM events
      UNION ALL
      SELECT event_id, 'Label/' || event_type FROM events
      UNION ALL
      SELECT event_id, 'Value/' || json_extract_string(props, '$.k')
      FROM events
    ),
    closure AS (
      SELECT n.node_id, n.parent_id AS ancestor_id, 1 AS dist
      FROM nodes n WHERE n.parent_id IS NOT NULL
      UNION ALL
      SELECT c.node_id, n.parent_id, c.dist + 1
      FROM closure c JOIN nodes n ON n.node_id = c.ancestor_id
      WHERE n.parent_id IS NOT NULL
    )
    SELECT t.event_id, t.tag, a.name AS ancestor, CAST(c.dist AS INT) AS dist
    FROM tags t
    JOIN nodes n ON n.name = split_part(t.tag, '/', 1)
    JOIN closure c ON c.node_id = n.node_id
    JOIN nodes a ON a.node_id = c.ancestor_id
    """,
)
def x4b_hed_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 completion: parsed HED tags joined to the hed_schema_node
    ontology with full ancestor paths. The closure of the (tiny) ontology
    is computed once by iterative keep-origin joins
    (operators/traverse.ancestor_closure — the DataFrame form of the
    recursive CTE) and broadcast onto the exploded tag rows, so the big
    side is touched exactly once and never recursed over."""
    from loris_mri_spark.operators.traverse import ancestor_closure

    nodes = spark.createDataFrame(
        _HED_NODES, "node_id int, name string, parent_id int"
    )
    closure = ancestor_closure(nodes, broadcast_edges=True)

    tags = _hed_event_nodes(spark, sf_dir).select(
        "event_id", F.col("node.tag").alias("tag")
    )

    names = nodes.select("node_id", "name")
    anc_names = nodes.select(
        F.col("node_id").alias("ancestor_id"), F.col("name").alias("ancestor")
    )
    resolved = (
        F.broadcast(closure)
        .join(F.broadcast(names), "node_id")
        .join(F.broadcast(anc_names), "ancestor_id")
        .select("name", "ancestor", "dist")
    )
    return tags.join(
        F.broadcast(resolved),
        F.split(tags["tag"], "/").getItem(0) == resolved["name"],
    ).select("event_id", "tag", "ancestor", "dist")


@query(
    "x5_grouped_agg_trimmed_mean",
    oracle="""
    WITH x AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem),
    r AS (
      SELECT l_returnflag, l_linestatus, cents,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
      FROM x)
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(cents) AS BIGINT) AS trimmed_sum_cents,
           CAST(COUNT(*) AS BIGINT) AS trimmed_n,
           ROUND(CAST(SUM(cents) AS DOUBLE) / 100 / COUNT(*), 4)
             AS trimmed_mean
    FROM r
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY l_returnflag, l_linestatus
    """,
)
def x5_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: vectorized pandas UDAF (GROUPED_AGG) — the last Python-interop
    eval type in the matrix (SCALAR/GROUPED_MAP/MAP/ARROW/UDTF are
    exercised elsewhere; see functions/udaf.py). 10%-trimmed mean of
    l_extendedprice per (returnflag, linestatus): prices are quantized to
    exact int64 cents JVM-side (ROUND before cast — Spark casts
    double->long by truncation but DuckDB by rounding, so the round must
    happen while the value is still a near-integer double), the UDAF
    returns the exact trimmed sum per group, and the mean is divided back
    out JVM-side in the oracle's operation order.

    Scale note: GROUPED_AGG ships each group's whole value vector to one
    task (no partial aggregation) — acceptable here (4 groups) and for
    any bounded-cardinality profile, but the RELATIONAL rewrite (window
    rank + filter + builtin SUM, exactly this query's oracle) is the
    100 TB path; the UDAF exists to certify the interop surface, not to
    replace it."""
    from loris_mri_spark.functions.udaf import trimmed_sum_cents

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    agg = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(trimmed_sum_cents("cents").alias("__sn"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.element_at("__sn", 1).alias("trimmed_sum_cents"),
            F.element_at("__sn", 2).alias("__n"),
        )
    )
    trimmed_n = F.col("__n") - 2 * F.expr("__n DIV 10")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "trimmed_sum_cents",
        trimmed_n.alias("trimmed_n"),
        F.round(
            F.col("trimmed_sum_cents").cast("double") / F.lit(100) / trimmed_n,
            4,
        ).alias("trimmed_mean"),
    )
