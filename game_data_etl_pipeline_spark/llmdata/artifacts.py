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
  pruned. Matching is by the EXACT key shape
  ``<flattened path>_<size>_<mtime_ns>`` (anchored regex), not a bare
  prefix: a prefix match would also claim keys of fixtures whose
  flattened path merely extends this one (``/data/sf`` vs
  ``/data/sf/sub`` or ``/data/sf_v2`` all flatten to names starting
  ``data_sf_``) and delete their LIVE artifacts out from under
  concurrent readers (round-9 advice). In-flight ``staging_*`` dirs
  never match the key shape and are left alone.
- **Trash-dir grace**: force-rebuild trash trees (see above) are
  reaped by ``prune_stale_keys`` only once they are older than
  ``TRASH_GRACE_SEC`` — reaping them in the same pass that published
  the replacement would reopen the reader window the rename-aside
  exists to close. ``force=True`` is therefore safe for readers whose
  scans finish within the grace period; a reader that holds an old
  tree longer than that must re-resolve the path.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import time
from contextlib import contextmanager

# how long a force-rebuild trash tree survives before GC may reap it:
# long enough for any in-flight scan of the old snapshot to finish
TRASH_GRACE_SEC = 600


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


@contextmanager
def staging_tree(final: str):
    """``make_staging`` with guaranteed failure cleanup: yields a
    staging dir next to ``final``; if the build body raises — a Spark
    write failure, a saturation guard, a marker-write OSError — the
    staging tree is removed before the exception propagates. GC never
    touches in-flight ``staging_*`` dirs (they could be another
    process's live build), so an unprotected builder failure would
    otherwise leak one partial tree per retry, every driver window
    (round-11 review finding). The happy path ends with the caller's
    ``publish_staging`` consuming the dir inside the ``with``."""
    staging = make_staging(final)
    try:
        yield staging
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise


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
        # already resolved `final` keep a consistent snapshot. The
        # trash tree is NOT reaped here — deleting it immediately
        # after the rename would tear files out of those very scans;
        # it carries a unique suffix and ages out via
        # prune_stale_keys' TRASH_GRACE_SEC window (round-9 advice).
        trash = f"{final}.trash.{os.path.basename(staging)}"
        try:
            os.rename(final, trash)
            # rename PRESERVES the dir's mtime (the original build
            # time), so an artifact older than the grace window would
            # be reaped by the very prune pass that follows this
            # publish — stamp the trash dir with the DISPLACEMENT time
            # so the grace clock starts now (the reader window the
            # rename-aside exists to protect opens at displacement,
            # not at build)
            os.utime(trash, None)
        except OSError:
            pass  # someone else already moved/removed it
    try:
        os.rename(staging, final)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.isfile(os.path.join(final, marker)):
            raise


def prune_stale_keys(final: str, sf_dir: str) -> None:
    """After a successful publish, retire sibling artifact keys for
    the SAME fixture path — superseded fingerprints from regenerated
    fixtures — and reap aged-out trash trees. Matching is by the exact
    key shape (see module docstring): other fixtures' keys — including
    ones whose flattened path extends this one — and in-flight staging
    dirs are untouched. A superseded LIVE key is never rmtree'd
    in-pass (a reader mid-scan on the just-superseded fingerprint
    would hit the same torn-files window the force-rebuild grace
    closes); it is renamed aside to a ``.trash.*`` name stamped with
    the displacement time, so ALL reader-visible trees age out
    uniformly through the one TRASH_GRACE_SEC window (round-10
    advice). Trash dirs younger than the grace are skipped so the
    pass that minted them cannot reap them."""
    version_dir = os.path.dirname(final)
    keep = os.path.basename(final)
    pat = re.compile(rf"^{re.escape(_sf_prefix(sf_dir))}_\d+_\d+(?P<trash>\.trash\..+)?$")
    now = time.time()
    try:
        names = os.listdir(version_dir)
    except OSError:
        return
    for name in names:
        m = pat.match(name)
        if m is None or name == keep:
            continue
        path = os.path.join(version_dir, name)
        if m.group("trash"):
            try:
                if now - os.path.getmtime(path) < TRASH_GRACE_SEC:
                    continue
            except OSError:
                continue  # already reaped by a concurrent pruner
            shutil.rmtree(path, ignore_errors=True)
        else:
            # superseded live key: displace, don't delete — it becomes
            # a trash tree and a LATER pass reaps it after the grace
            trash = f"{path}.trash.gc{os.getpid()}_{int(now * 1000)}"
            try:
                os.rename(path, trash)
                os.utime(trash, None)  # grace clock starts at displacement
            except OSError:
                pass  # a concurrent pruner won the rename
