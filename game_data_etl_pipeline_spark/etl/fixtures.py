"""Deterministic raw-payload fixtures for the game-data ETL.

Shaped exactly like the API envelopes the reference transforms read
(FIXTURES.md §A), covering every guard the reference encodes:

- agents: unplayable + missing-flag records (dropped), null role
  ('Unknown'), >500-char description (truncated), empty and missing
  abilities arrays (zero child rows);
- weapons: null weaponStats/shopData (zero/'' defaults), null
  damageRanges (zero child rows), multi-range weapon (indices 0..n);
- maps: null callouts (num_callouts 0);
- gamemodes: missing allowsMatchTimeouts (false) and duration ('').
"""

from __future__ import annotations

import json
import os

LONG_DESC = "x" * 600  # truncates to 500

RAW: dict[str, list[dict]] = {
    "agents": [
        {
            "uuid": "agent-1",
            "displayName": "Breeze Runner",
            "isPlayableCharacter": True,
            "role": {"displayName": "Duelist"},
            "description": "Fast entry agent.",
            "displayIcon": "https://img.example/a1.png",
            "abilities": [
                {"slot": "Q", "displayName": "Dash", "description": "Short dash."},
                {"slot": "E", "displayName": "Updraft", "description": None},
            ],
        },
        {
            "uuid": "agent-npc",
            "displayName": "Range Dummy",
            "isPlayableCharacter": False,
            "role": {"displayName": "Target"},
            "description": "Not playable.",
            "displayIcon": "https://img.example/npc.png",
            "abilities": [],
        },
        {
            # missing isPlayableCharacter -> treated false -> dropped
            "uuid": "agent-unknown-flag",
            "displayName": "Mystery",
            "role": {"displayName": "Duelist"},
            "description": "No flag.",
            "displayIcon": "https://img.example/m.png",
            "abilities": [],
        },
        {
            "uuid": "agent-2",
            "displayName": "Long Scribe",
            "isPlayableCharacter": True,
            "role": None,  # -> 'Unknown'
            "description": LONG_DESC,  # -> truncated to 500
            "displayIcon": "https://img.example/a2.png",
            "abilities": [],  # agent appears; zero ability rows
        },
        {
            "uuid": "agent-3",
            "displayName": "Quiet Viper",
            "isPlayableCharacter": True,
            "role": {"displayName": "Controller"},
            "description": None,  # -> ''
            "displayIcon": "https://img.example/a3.png",
            # abilities missing entirely -> zero ability rows
        },
    ],
    "weapons": [
        {
            "uuid": "weapon-1",
            "displayName": "Vandal Mk2",
            "category": "EEquippableCategory::Rifle",
            "displayIcon": "https://img.example/w1.png",
            "shopData": {"cost": 2900},
            "weaponStats": {
                "fireRate": 9.75,
                "magazineSize": 25,
                "reloadTimeSeconds": 2.5,
                "equipTimeSeconds": 1.0,
                "firstBulletAccuracy": 0.25,
                "wallPenetration": "EWallPenetrationDisplayType::Medium",
                "damageRanges": [
                    {"rangeStartMeters": 0.0, "rangeEndMeters": 15.0, "headDamage": 160.0, "bodyDamage": 40.0, "legDamage": 34.0},
                    {"rangeStartMeters": 15.0, "rangeEndMeters": 50.0, "headDamage": 140.0, "bodyDamage": 38.0, "legDamage": 32.3},
                ],
            },
        },
        {
            # melee: no stats, no shop data -> all defaults, zero damage rows
            "uuid": "weapon-2",
            "displayName": "Training Knife",
            "category": "EEquippableCategory::Melee",
            "displayIcon": "https://img.example/w2.png",
            "shopData": None,
            "weaponStats": None,
        },
        {
            "uuid": "weapon-3",
            "displayName": "Pocket Pistol",
            "category": "EEquippableCategory::Sidearm",
            "displayIcon": "https://img.example/w3.png",
            "shopData": {"cost": 400},
            "weaponStats": {
                "fireRate": 6.75,
                # magazineSize missing -> 0
                "reloadTimeSeconds": 1.5,
                "equipTimeSeconds": 0.75,
                "firstBulletAccuracy": 0.4,
                "wallPenetration": "EWallPenetrationDisplayType::Low",
                "damageRanges": None,  # -> zero damage rows
            },
        },
    ],
    "maps": [
        {
            "uuid": "map-1",
            "displayName": "Harbor Split",
            "coordinates": "45.4°N, 12.3°E",
            "callouts": [{"regionName": "A Site"}, {"regionName": "Mid"}, {"regionName": "B Site"}],
            "splash": "https://img.example/m1.png",
        },
        {
            "uuid": "map-2",
            "displayName": "The Range",
            "coordinates": None,  # -> ''
            "callouts": None,  # -> 0
            "splash": "https://img.example/m2.png",
        },
    ],
    "gamemodes": [
        {
            "uuid": "mode-1",
            "displayName": "Standard",
            "duration": "30-40 minutes",
            "allowsMatchTimeouts": True,
        },
        {
            "uuid": "mode-2",
            "displayName": "Quick Blitz",
            # duration missing -> '' ; allowsMatchTimeouts missing -> false
        },
    ],
}


def raw_json_records(endpoint: str) -> list[str]:
    """Single-record JSON strings (input shape for transform.records_df)."""
    return [json.dumps(r) for r in RAW[endpoint]]


def write_landing(dir_path: str, endpoints: list[str] | None = None, *, broken: set[str] = frozenset()) -> None:
    """Write envelope files like a completed extract; endpoints in
    ``broken`` get a non-200 envelope (partial-failure fixture)."""
    os.makedirs(dir_path, exist_ok=True)
    for ep in endpoints or list(RAW):
        payload = {"status": 503, "data": []} if ep in broken else {"status": 200, "data": RAW[ep]}
        with open(os.path.join(dir_path, f"{ep}.json"), "w", encoding="utf-8") as f:
            json.dump(payload, f)


# Golden outputs (transform contract; lineage columns excluded).
EXPECTED: dict[str, list[tuple]] = {
    "agents": [
        ("agent-1", "Breeze Runner", "Duelist", "Fast entry agent.", "https://img.example/a1.png"),
        ("agent-2", "Long Scribe", "Unknown", "x" * 500, "https://img.example/a2.png"),
        ("agent-3", "Quiet Viper", "Controller", "", "https://img.example/a3.png"),
    ],
    "abilities": [
        ("Breeze Runner", "Duelist", "Q", "Dash", "Short dash."),
        ("Breeze Runner", "Duelist", "E", "Updraft", ""),
    ],
    "weapons": [
        ("weapon-1", "Vandal Mk2", "Rifle", 2900, 9.75, 25, 2.5, 1.0, 0.25, "EWallPenetrationDisplayType::Medium", "https://img.example/w1.png"),
        ("weapon-2", "Training Knife", "Melee", 0, 0.0, 0, 0.0, 0.0, 0.0, "", "https://img.example/w2.png"),
        ("weapon-3", "Pocket Pistol", "Sidearm", 400, 6.75, 0, 1.5, 0.75, 0.4, "EWallPenetrationDisplayType::Low", "https://img.example/w3.png"),
    ],
    "weapon_damage": [
        ("Vandal Mk2", 0, 0.0, 15.0, 160.0, 40.0, 34.0),
        ("Vandal Mk2", 1, 15.0, 50.0, 140.0, 38.0, 32.3),
    ],
    "maps": [
        ("map-1", "Harbor Split", "45.4°N, 12.3°E", 3, "https://img.example/m1.png"),
        ("map-2", "The Range", "", 0, "https://img.example/m2.png"),
    ],
    "gamemodes": [
        ("mode-1", "Standard", "30-40 minutes", True),
        ("mode-2", "Quick Blitz", "", False),
    ],
}

COLUMNS: dict[str, list[str]] = {
    "agents": ["uuid", "name", "role", "description", "icon_url"],
    "abilities": ["agent_name", "agent_role", "slot", "ability_name", "description"],
    "weapons": [
        "uuid", "name", "category", "cost", "fire_rate", "magazine_size", "reload_time",
        "equip_time", "first_bullet_accuracy", "wall_penetration", "icon_url",
    ],
    "weapon_damage": ["weapon_name", "range_index", "range_start", "range_end", "head_damage", "body_damage", "leg_damage"],
    "maps": ["uuid", "name", "coordinates", "num_callouts", "splash_url"],
    "gamemodes": ["uuid", "name", "duration", "allows_timeouts"],
}
