"""Transform phase: raw envelope JSON -> 6 curated tables, as pure
DataFrame expressions.

Each function reproduces the reference transform's observable contract
(reference etl/pipeline.py:146-235) declaratively:

- playability filter: missing/false isPlayableCharacter drops the row
  (``coalesce(col, false)`` — reference :149-150, :163-164);
- null-safe struct access with defaults: role -> 'Unknown' (:154),
  shopData/weaponStats -> zeros/'' (:180-191);
- description truncation to 500 chars after null-coalescing (:155,173);
- category enum prefix strip (:185);
- abilities explode (:167) and damageRanges posexplode with 0-based
  range_index (:201-204); null arrays contribute zero child rows.

One conscious deviation, documented: the reference's ``.get(k, d)``
defaults apply only to MISSING keys — an explicit JSON null slips
through as NULL. A declared schema cannot distinguish missing from
null, so here both get the default. (The live API never sends null
for these fields; the reference's golden DB is unaffected.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.etl import schemas

DESCRIPTION_MAX = 500
CATEGORY_PREFIX = "EEquippableCategory::"


def parse_envelope(spark: SparkSession, landing_file: str, endpoint: str) -> DataFrame:
    """Landing file -> one row per payload record.

    multiLine read of the envelope with an explicit schema; non-200
    envelopes yield zero records (same degrade-to-empty semantics as
    the extractor's HTTP path).
    """
    env_schema = schemas.envelope(schemas.ENDPOINT_SCHEMAS[endpoint])
    raw = spark.read.schema(env_schema).option("multiLine", "true").json(landing_file)
    return (
        raw.filter(F.col("status") == 200)
        .select(F.explode(F.coalesce(F.col("data"), F.array())).alias("rec"))
        .select("rec.*")
    )


def records_df(spark: SparkSession, endpoint: str, json_records: list[str]) -> DataFrame:
    """Parse a list of single-record JSON strings (test/fixture entry)."""
    schema = schemas.ENDPOINT_SCHEMAS[endpoint]
    raw = spark.createDataFrame([(s,) for s in json_records], "j string")
    return raw.select(F.from_json("j", schema).alias("rec")).select("rec.*")


def _str(col: str | Column, default: str = "") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def _truncated_description(col: str | Column) -> Column:
    return F.substring(_str(col), 1, DESCRIPTION_MAX)


def _playable(df: DataFrame) -> DataFrame:
    return df.filter(F.coalesce(F.col("isPlayableCharacter"), F.lit(False)))


def _role() -> Column:
    return F.coalesce(F.col("role.displayName"), F.lit("Unknown"))


def transform_agents(raw: DataFrame) -> DataFrame:
    """agents: playable only; role default 'Unknown'; description <=500."""
    return _playable(raw).select(
        _str("uuid").alias("uuid"),
        _str("displayName").alias("name"),
        _role().alias("role"),
        _truncated_description("description").alias("description"),
        _str("displayIcon").alias("icon_url"),
    )


def transform_abilities(raw: DataFrame) -> DataFrame:
    """abilities: correlated flatten of agents.abilities, parent attrs
    denormalized onto each child row."""
    return (
        _playable(raw)
        .select(
            _str("displayName").alias("agent_name"),
            _role().alias("agent_role"),
            F.explode(F.coalesce(F.col("abilities"), F.array())).alias("ab"),
        )
        .select(
            "agent_name",
            "agent_role",
            _str("ab.slot").alias("slot"),
            _str("ab.displayName").alias("ability_name"),
            _truncated_description("ab.description").alias("description"),
        )
    )


def transform_weapons(raw: DataFrame) -> DataFrame:
    """weapons: flattened stats with zero/'' defaults for absent structs."""
    return raw.select(
        _str("uuid").alias("uuid"),
        _str("displayName").alias("name"),
        F.regexp_replace(_str("category"), f"^{CATEGORY_PREFIX}", "").alias("category"),
        F.coalesce(F.col("shopData.cost"), F.lit(0)).alias("cost"),
        F.coalesce(F.col("weaponStats.fireRate"), F.lit(0.0)).alias("fire_rate"),
        F.coalesce(F.col("weaponStats.magazineSize"), F.lit(0)).alias("magazine_size"),
        F.coalesce(F.col("weaponStats.reloadTimeSeconds"), F.lit(0.0)).alias("reload_time"),
        F.coalesce(F.col("weaponStats.equipTimeSeconds"), F.lit(0.0)).alias("equip_time"),
        F.coalesce(F.col("weaponStats.firstBulletAccuracy"), F.lit(0.0)).alias("first_bullet_accuracy"),
        _str("weaponStats.wallPenetration").alias("wall_penetration"),
        _str("displayIcon").alias("icon_url"),
    )


def transform_damage_ranges(raw: DataFrame) -> DataFrame:
    """weapon_damage: positional unnest of weaponStats.damageRanges."""
    return (
        raw.select(
            _str("displayName").alias("weapon_name"),
            F.posexplode(F.coalesce(F.col("weaponStats.damageRanges"), F.array())).alias("range_index", "dr"),
        )
        .select(
            "weapon_name",
            "range_index",
            F.coalesce(F.col("dr.rangeStartMeters"), F.lit(0.0)).alias("range_start"),
            F.coalesce(F.col("dr.rangeEndMeters"), F.lit(0.0)).alias("range_end"),
            F.coalesce(F.col("dr.headDamage"), F.lit(0.0)).alias("head_damage"),
            F.coalesce(F.col("dr.bodyDamage"), F.lit(0.0)).alias("body_damage"),
            F.coalesce(F.col("dr.legDamage"), F.lit(0.0)).alias("leg_damage"),
        )
    )


def transform_maps(raw: DataFrame) -> DataFrame:
    """maps: callouts reduced to a count; null array counts 0 (Spark's
    size(NULL) is -1, so the coalesce is semantically load-bearing)."""
    return raw.select(
        _str("uuid").alias("uuid"),
        _str("displayName").alias("name"),
        _str("coordinates").alias("coordinates"),
        F.size(F.coalesce(F.col("callouts"), F.array())).alias("num_callouts"),
        _str("splash").alias("splash_url"),
    )


def transform_gamemodes(raw: DataFrame) -> DataFrame:
    """gamemodes: straight projection; allows_timeouts defaults false."""
    return raw.select(
        _str("uuid").alias("uuid"),
        _str("displayName").alias("name"),
        _str("duration").alias("duration"),
        F.coalesce(F.col("allowsMatchTimeouts"), F.lit(False)).alias("allows_timeouts"),
    )


# endpoint -> [(output_table, transform)] — mirrors the reference's
# transform_all dispatch (etl/pipeline.py:123-139)
TRANSFORMS: dict[str, list[tuple[str, callable]]] = {
    "agents": [("agents", transform_agents), ("abilities", transform_abilities)],
    "weapons": [("weapons", transform_weapons), ("weapon_damage", transform_damage_ranges)],
    "maps": [("maps", transform_maps)],
    "gamemodes": [("gamemodes", transform_gamemodes)],
}


def transform_all(raw_by_endpoint: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Dispatch every landed endpoint to its table transforms."""
    out: dict[str, DataFrame] = {}
    for endpoint, frames in TRANSFORMS.items():
        if endpoint not in raw_by_endpoint:
            continue
        for table, fn in frames:
            out[table] = fn(raw_by_endpoint[endpoint])
    return out
