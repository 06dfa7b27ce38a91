"""Shared lifecycle discipline for persisted index artifacts.

ann_index.py and lex_index.py both persist fingerprint-keyed artifact
directories (key = fixture path + (size, mtime_ns) of the source
parquet). Three failure modes the round-8 review called out live here,
fixed once for both modules:

- **Publish atomicity**: every artifact tree — including the upsert
  demo tree, which round 8 wrote in place — is fully built in a
  ``tempfile.mkdtemp`` staging dir and ``os.rename``d into place.
  Readers never observe a partial tree; concurrent builders race
  benignly (rename is atomic within a filesystem, the loser discards
  its staging dir and reads the winner's deterministic twin).
- **Force-rebuild atomicity**: ``force=True`` must not ``rmtree`` the
  live artifact before the replacement exists (a concurrent reader
  would observe the index vanish mid-query). The old tree is renamed
  aside to a unique trash path first — readers holding the old path
  keep a consistent snapshot until their scan ends — then reaped.
- **Garbage collection**: fingerprint keying means every fixture
  regeneration mints a fresh key and orphans the previous artifact;
  without GC the warehouse grows unboundedly across rounds. After a
  successful publish, sibling keys for the SAME fixture path are
  pruned (the trailing ``_`` in the prefix match keeps ``sf0.1`` from
  ever matching ``sf0.1x``; in-flight ``staging_*`` dirs never match a
  fixture-path prefix and are left alone).
"""

from __future__ import annotations

import os
import shutil
import tempfile


def fingerprint_key(sf_dir: str, source_file: str) -> str:
    """Artifact key for one fixture: path + (size, mtime_ns) of the
    source parquet, so a regenerated fixture at the same path gets a
    FRESH key — the stale-index failure mode of path-only keying."""
    st = os.stat(os.path.join(sf_dir, source_file))
    return f"{_sf_prefix(sf_dir)}_{st.st_size}_{st.st_mtime_ns}"


def _sf_prefix(sf_dir: str) -> str:
    return sf_dir.strip("/").replace("/", "_")


def make_staging(final: str) -> str:
    """A staging dir next to ``final`` (same filesystem, so the
    publish rename is atomic)."""
    os.makedirs(os.path.dirname(final), exist_ok=True)
    return tempfile.mkdtemp(prefix="staging_", dir=os.path.dirname(final))


def publish_staging(staging: str, final: str, *, marker: str, force: bool = False) -> None:
    """Atomically publish a FULLY-WRITTEN staging tree as ``final``.

    ``marker`` is the completion-marker filename the builder wrote as
    its last staging step (``meta.json`` / ``upsert_done.json``); its
    presence inside ``final`` is the won-the-race signal. On rename
    failure the staging tree is discarded and the winner's artifact is
    trusted if its marker is present (deterministic builds make the
    two trees bit-identical), else the original error propagates."""
    if force and os.path.isdir(final):
        # rename the live tree aside before the swap: readers that
        # already resolved `final` keep a consistent snapshot, new
        # readers block on the marker check until the rename lands
        trash = f"{final}.trash.{os.path.basename(staging)}"
        try:
            os.rename(final, trash)
        except OSError:
            pass  # someone else already moved/removed it
        else:
            shutil.rmtree(trash, ignore_errors=True)
    try:
        os.rename(staging, final)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.isfile(os.path.join(final, marker)):
            raise


def prune_stale_keys(final: str, sf_dir: str) -> None:
    """After a successful publish, reap sibling artifact keys (and
    leftover trash dirs) for the SAME fixture path — superseded
    fingerprints from regenerated fixtures. Other fixtures' keys and
    in-flight staging dirs are untouched."""
    version_dir = os.path.dirname(final)
    keep = os.path.basename(final)
    prefix = _sf_prefix(sf_dir) + "_"
    try:
        names = os.listdir(version_dir)
    except OSError:
        return
    for name in names:
        if name.startswith(prefix) and name != keep:
            shutil.rmtree(os.path.join(version_dir, name), ignore_errors=True)
