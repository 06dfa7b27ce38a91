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


@given(
    words=st.lists(
        st.text(
            # anything except the space delimiter; includes unicode and
            # the '<', '/', '>' chars of the end-of-word marker itself
            st.characters(blacklist_characters=" "),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    ),
    counts=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_bpe_roundtrip_is_lossless_on_arbitrary_text(words, counts):
    """BPE's lossless-encoding invariant holds for ARBITRARY words —
    including empty strings, unicode, and words containing the literal
    '</w>' marker characters: concatenating a word's symbols always
    reproduces word + '</w>', so detokenization is exact regardless of
    what the merge table learned."""
    from game_data_etl_pipeline_spark.llmdata.text import _bpe_encode_word, _train_bpe

    wc = [(w, counts.draw(st.integers(1, 50))) for w in words if w]
    merges = _train_bpe(wc, n_merges=64)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        syms = _bpe_encode_word(w, ranks)
        assert "".join(syms) == w + "</w>"
        assert len(syms) >= 1


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=200),
    budget=st.integers(min_value=1, max_value=2048),
)
@settings(max_examples=200, deadline=None)
def test_greedy_pack_invariants_on_arbitrary_sizes(tokens, budget):
    """First-fit packing invariants for arbitrary document sizes and
    budgets — including documents larger than the budget (a pack to
    themselves) and zero-token documents: pack ids are contiguous and
    non-decreasing, no multi-doc pack exceeds the budget, and a new
    pack opens ONLY when the document wouldn't fit."""
    import pandas as pd

    from game_data_etl_pipeline_spark.llmdata.corpus import _greedy_pack_fn

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(tokens)),
            "lang": ["xx"] * len(tokens),
            "n": tokens,
        }
    )
    out = _greedy_pack_fn(budget)(pdf)
    packs: dict[int, int] = {}
    prev_pack = -1
    for row, n in zip(out.itertuples(index=False), tokens):
        assert row.pack_id in (prev_pack, prev_pack + 1)
        if row.pack_id != prev_pack:
            # a new pack must have been NECESSARY (unless first doc)
            if prev_pack >= 0:
                assert packs[prev_pack] + n > budget
            assert row.fill_after == n
        else:
            assert packs[row.pack_id] + n == row.fill_after
        packs[row.pack_id] = row.fill_after
        prev_pack = row.pack_id
    for pid, fill in packs.items():
        members = [t for r, t in zip(out.itertuples(index=False), tokens) if r.pack_id == pid]
        assert fill == sum(members)
        assert fill <= budget or len(members) == 1
