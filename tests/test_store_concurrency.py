"""Cross-job store discipline — VERDICT r6 item 8.

Two families of contract the bucketed dedup store must hold once several
jobs share it:

* **Config/version fencing.** A fold under a drifted ``DedupConfig`` (or a
  future store layout) must refuse loudly — the band-summary merge math
  depends on the config's band layout, so folding mismatched state corrupts
  the store silently.  Mirrors the pipeline checkpoint's
  ``refusing to resume`` discipline (``pipeline.py:68``).
* **Reader expectations during a fold.** Parquet mode has no multi-table
  transaction (the docstring in ``incremental.py`` is explicit that Iceberg
  replaces the journal with one), so the pinned contract is: readers are
  never blocked by the writer fence, and at every crash point of an
  interrupted fold each table individually is a COMPLETE pre-fold or
  post-fold state — never a torn half-write.  (Cross-table atomicity is
  exactly what ``repair_fold`` restores.)
"""

import json

import pytest

from datasketches_pig_spark.config import DedupConfig
from datasketches_pig_spark.incremental import (
    FoldLockError,
    _fold_lock,
    _store_meta_path,
    fold_history,
    incremental_dedup,
    pending_fold,
    repair_fold,
    save_history,
)
from datasketches_pig_spark.pipeline import run_pipeline
from tests.test_incremental import split_corpus  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def fold_inputs(spark, split_corpus, tmp_path_factory):  # noqa: F811
    """Day-1 store state + day-2 fold inputs, checkpointed once for the
    module; each test builds its own store directory from these."""
    day1, day2, _ = split_corpus
    cfg = DedupConfig()
    r1 = run_pipeline(spark, day1, cfg)
    sigs1 = r1.stage_frames["signatures"].localCheckpoint()
    clusters1 = r1.clusters.localCheckpoint()

    seedbase = str(tmp_path_factory.mktemp("meta_seed"))
    for t in ("signatures", "band_buckets", "clusters"):
        spark.sql(f"DROP TABLE IF EXISTS metaseed_{t}")
    save_history(spark, sigs1, clusters1, cfg, seedbase, "metaseed", num_buckets=8)
    inc = incremental_dedup(
        spark, day2, cfg, "metaseed",
        old_transcripts=day1.select("clip_id", "transcript"),
    )
    batch = (
        inc.new_sigs.localCheckpoint(),
        inc.assignments.localCheckpoint(),
        inc.merges.localCheckpoint(),
    )
    return cfg, sigs1, clusters1, batch


def _fresh_store(spark, prefix, base, cfg, sigs1, clusters1):
    for t in ("signatures", "band_buckets", "clusters"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    save_history(spark, sigs1, clusters1, cfg, base, prefix, num_buckets=8)


def _table_snapshots(sess, prefix):
    """Per-table canonical snapshots (sorted rows) — one entry per store
    table so torn state is attributable to a single table."""
    return {
        "signatures": sorted(
            r["clip_id"] for r in sess.table(f"{prefix}_signatures").collect()
        ),
        "band_buckets": sorted(
            (r["band_key"], tuple(r["members"]), r["bucket_n"], r["center"])
            for r in sess.table(f"{prefix}_band_buckets").collect()
        ),
        "clusters": sorted(
            (r["clip_id"], r["cluster_id"])
            for r in sess.table(f"{prefix}_clusters").collect()
        ),
    }


# ---------------------------------------------------------------------------
# config-hash / store-version fencing
# ---------------------------------------------------------------------------

def test_fold_refuses_config_mismatch(spark, fold_inputs, tmp_path_factory):
    cfg, sigs1, clusters1, batch = fold_inputs
    base = str(tmp_path_factory.mktemp("meta_mismatch"))
    _fresh_store(spark, "metamm", base, cfg, sigs1, clusters1)
    drifted = DedupConfig(jaccard_threshold=0.8)
    assert drifted.config_hash() != cfg.config_hash()
    with pytest.raises(ValueError, match="refusing to fold.*config_hash"):
        fold_history(spark, *batch, drifted, base, "metamm")
    # refusal is pre-journal: the store stays clean and the ORIGINAL config
    # still folds
    assert pending_fold(base) is None
    fold_history(spark, *batch, cfg, base, "metamm")


def test_repair_refuses_config_mismatch(spark, fold_inputs, tmp_path_factory):
    cfg, sigs1, clusters1, batch = fold_inputs
    base = str(tmp_path_factory.mktemp("meta_repair"))
    _fresh_store(spark, "metarep", base, cfg, sigs1, clusters1)
    with pytest.raises(RuntimeError, match="crash injected"):
        fold_history(
            spark, *batch, cfg, base, "metarep", _fail_after="buckets_staged"
        )
    drifted = DedupConfig(jaccard_threshold=0.8)
    with pytest.raises(ValueError, match="refusing to fold.*config_hash"):
        repair_fold(spark, drifted, base, "metarep")
    assert pending_fold(base) is not None  # journal untouched by the refusal
    assert repair_fold(spark, cfg, base, "metarep") is True


def test_legacy_store_adopts_current_config(spark, fold_inputs, tmp_path_factory):
    """A store written before meta stamping existed: first fold adopts the
    current config as the store's, after which drift is fenced."""
    cfg, sigs1, clusters1, batch = fold_inputs
    base = str(tmp_path_factory.mktemp("meta_legacy"))
    _fresh_store(spark, "metaleg", base, cfg, sigs1, clusters1)
    _store_meta_path(base).unlink()  # simulate the pre-r7 store
    fold_history(spark, *batch, cfg, base, "metaleg")
    meta = json.loads(_store_meta_path(base).read_text())
    assert meta["config_hash"] == cfg.config_hash()
    with pytest.raises(ValueError, match="refusing to fold"):
        fold_history(
            spark, *batch, DedupConfig(jaccard_threshold=0.8), base, "metaleg"
        )


def test_corrupt_and_future_meta_refuse(spark, fold_inputs, tmp_path_factory):
    cfg, sigs1, clusters1, batch = fold_inputs
    base = str(tmp_path_factory.mktemp("meta_bad"))
    _fresh_store(spark, "metabad", base, cfg, sigs1, clusters1)
    _store_meta_path(base).write_text("{not json")
    with pytest.raises(ValueError, match="corrupted"):
        fold_history(spark, *batch, cfg, base, "metabad")
    _store_meta_path(base).write_text(
        json.dumps({"store_version": 99, "config_hash": cfg.config_hash()})
    )
    with pytest.raises(ValueError, match="store version 99"):
        fold_history(spark, *batch, cfg, base, "metabad")


# ---------------------------------------------------------------------------
# readers vs a concurrent/interrupted fold
# ---------------------------------------------------------------------------

def test_reader_not_blocked_by_fold_lock(spark, fold_inputs, tmp_path_factory):
    """The writer fence fences WRITERS only: a second session reading the
    store while the lock is held succeeds (and a second fold refuses)."""
    cfg, sigs1, clusters1, batch = fold_inputs
    base = str(tmp_path_factory.mktemp("meta_rdlock"))
    _fresh_store(spark, "metard", base, cfg, sigs1, clusters1)
    want = _table_snapshots(spark, "metard")
    reader = spark.newSession()
    with _fold_lock(base):
        assert _table_snapshots(reader, "metard") == want
        with pytest.raises(FoldLockError):
            fold_history(spark, *batch, cfg, base, "metard")


def test_reader_sees_whole_tables_at_every_crash_point(
    spark, fold_inputs, tmp_path_factory
):
    """At every injected crash point, a second session's view of EACH table
    is a complete pre-fold or post-fold state — the append/stage-then-swap
    steps never expose a torn table — and repair converges all tables to
    the post state."""
    cfg, sigs1, clusters1, batch = fold_inputs

    refbase = str(tmp_path_factory.mktemp("meta_ref"))
    _fresh_store(spark, "metaref", refbase, cfg, sigs1, clusters1)
    pre = _table_snapshots(spark, "metaref")
    fold_history(spark, *batch, cfg, refbase, "metaref")
    post = _table_snapshots(spark, "metaref")
    assert pre != post  # the fold must actually change the store

    reader = spark.newSession()
    points = ("signatures", "buckets_staged", "buckets", "clusters_staged", "clusters")
    for point in points:
        prefix = f"metacr{point}"
        base = str(tmp_path_factory.mktemp(prefix))
        _fresh_store(spark, prefix, base, cfg, sigs1, clusters1)
        with pytest.raises(RuntimeError, match="crash injected"):
            fold_history(spark, *batch, cfg, base, prefix, _fail_after=point)
        got = _table_snapshots(reader, prefix)
        for t in ("signatures", "band_buckets", "clusters"):
            # keys differ per store prefix only in the table name; data pre/
            # post states are prefix-independent
            assert got[t] in (pre[t], post[t]), f"torn {t} at crash={point}"
        assert repair_fold(spark, cfg, base, prefix) is True
        # parquet-mode snapshot semantics for a STALE reader (its cached
        # file listing may predate the repair's stage-then-swap overwrite):
        # each table read either returns a complete pre/post state or fails
        # LOUDLY (FAILED_READ_FILE) — never a silently torn table — and
        # refreshTable converges the reader to the post state.
        try:
            after = _table_snapshots(reader, prefix)
            for t in ("signatures", "band_buckets", "clusters"):
                assert after[t] in (pre[t], post[t]), f"torn {t} after repair"
        except Exception as e:  # noqa: BLE001 — loudness is the contract
            msg = str(e)
            assert "FILE_NOT_EXIST" in msg or "does not exist" in msg, msg
        for t in ("signatures", "band_buckets", "clusters"):
            reader.catalog.refreshTable(f"{prefix}_{t}")
        assert _table_snapshots(reader, prefix) == post, point
