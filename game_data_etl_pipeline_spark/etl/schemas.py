"""Explicit schemas for the game-data API payloads.

The reference infers schema twice (pandas dtype inference, then SQLite
re-inference via to_sql — reference etl/pipeline.py:280), which is how
its golden DB ends up with head_damage REAL but body_damage INTEGER.
We declare schemas once: every raw payload parses against a StructType
(missing fields -> NULL -> coalesced defaults in transform.py), so the
output schema is identical on every run and at every scale.

Field sets mirror exactly what the reference transforms read
(reference etl/pipeline.py:146-235); FIXTURES.md §A documents them.
"""

from __future__ import annotations

from pyspark.sql import types as T

# {status: 200, data: [...]} — reference etl/pipeline.py:87-88
def envelope(data_element: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("status", T.IntegerType(), True),
            T.StructField("data", T.ArrayType(data_element), True),
        ]
    )


ABILITY = T.StructType(
    [
        T.StructField("slot", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
    ]
)

AGENT = T.StructType(
    [
        T.StructField("uuid", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("isPlayableCharacter", T.BooleanType(), True),
        T.StructField("role", T.StructType([T.StructField("displayName", T.StringType(), True)]), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("displayIcon", T.StringType(), True),
        T.StructField("abilities", T.ArrayType(ABILITY), True),
    ]
)

DAMAGE_RANGE = T.StructType(
    [
        T.StructField("rangeStartMeters", T.DoubleType(), True),
        T.StructField("rangeEndMeters", T.DoubleType(), True),
        T.StructField("headDamage", T.DoubleType(), True),
        T.StructField("bodyDamage", T.DoubleType(), True),
        T.StructField("legDamage", T.DoubleType(), True),
    ]
)

WEAPON_STATS = T.StructType(
    [
        T.StructField("fireRate", T.DoubleType(), True),
        T.StructField("magazineSize", T.IntegerType(), True),
        T.StructField("reloadTimeSeconds", T.DoubleType(), True),
        T.StructField("equipTimeSeconds", T.DoubleType(), True),
        T.StructField("firstBulletAccuracy", T.DoubleType(), True),
        T.StructField("wallPenetration", T.StringType(), True),
        T.StructField("damageRanges", T.ArrayType(DAMAGE_RANGE), True),
    ]
)

WEAPON = T.StructType(
    [
        T.StructField("uuid", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("displayIcon", T.StringType(), True),
        T.StructField("shopData", T.StructType([T.StructField("cost", T.IntegerType(), True)]), True),
        T.StructField("weaponStats", WEAPON_STATS, True),
    ]
)

MAP = T.StructType(
    [
        T.StructField("uuid", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("coordinates", T.StringType(), True),
        T.StructField(
            "callouts",
            T.ArrayType(T.StructType([T.StructField("regionName", T.StringType(), True)])),
            True,
        ),
        T.StructField("splash", T.StringType(), True),
    ]
)

GAMEMODE = T.StructType(
    [
        T.StructField("uuid", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("allowsMatchTimeouts", T.BooleanType(), True),
    ]
)

ENDPOINT_SCHEMAS: dict[str, T.StructType] = {
    "agents": AGENT,
    "weapons": WEAPON,
    "maps": MAP,
    "gamemodes": GAMEMODE,
    # competitivetiers is fetched-but-never-transformed in the reference
    # (config lists it; transform_all has no branch). We drop the dead
    # fetch rather than cargo-culting it — see SURVEY.md §2.A.
}
