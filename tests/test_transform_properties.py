"""Property-based transform robustness (SURVEY.md §5, 'secondary'):
randomized payloads with missing/null/extra fields must never make a
transform throw, and the documented defaults must hold on every output
row — the exact guarantees the reference encodes with `.get(..., d)` /
`or {}` guards (reference etl/pipeline.py:154, 180-181, 201, 216)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from game_data_etl_pipeline_spark.etl import transform

_text = st.one_of(st.none(), st.text(max_size=600))
_maybe_bool = st.one_of(st.none(), st.booleans())


def _records(fields: dict) -> st.SearchStrategy[list[dict]]:
    """Dicts where every field is independently present/absent/null,
    plus an always-extra field the schema must ignore."""
    return st.lists(
        st.fixed_dictionaries({}, optional={**fields, "extraField": st.integers()}),
        max_size=5,
    )


_agent_records = _records(
    {
        "uuid": _text,
        "displayName": _text,
        "description": _text,
        "displayIcon": _text,
        "isPlayableCharacter": _maybe_bool,
        "role": st.one_of(st.none(), st.fixed_dictionaries({}, optional={"displayName": _text})),
        "abilities": st.one_of(
            st.none(),
            st.lists(
                st.fixed_dictionaries(
                    {}, optional={"slot": _text, "displayName": _text, "description": _text}
                ),
                max_size=3,
            ),
        ),
    }
)

_gamemode_records = _records(
    {"uuid": _text, "displayName": _text, "duration": _text, "allowsMatchTimeouts": _maybe_bool}
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_agent_records)
def test_agent_transforms_never_throw_and_keep_defaults(spark, records):
    raw = transform.records_df(spark, "agents", [json.dumps(r) for r in records])
    agents = transform.transform_agents(raw).collect()
    abilities = transform.transform_abilities(raw).collect()
    n_playable = sum(1 for r in records if r.get("isPlayableCharacter") is True)
    assert len(agents) == n_playable  # missing/null flag -> dropped
    for row in agents:
        assert row["role"] is not None  # null role -> 'Unknown'
        assert row["description"] is not None and len(row["description"]) <= 500
    for row in abilities:
        assert row["ability_name"] is not None  # defaults, never NULL


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_gamemode_records)
def test_gamemode_transform_never_throws_and_keeps_defaults(spark, records):
    raw = transform.records_df(spark, "gamemodes", [json.dumps(r) for r in records])
    out = transform.transform_gamemodes(raw).collect()
    assert len(out) == len(records)  # no filter on this table
    for row in out:
        assert row["duration"] is not None  # missing -> ''
        assert row["allows_timeouts"] in (True, False)  # missing -> false
