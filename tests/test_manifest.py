"""Effectively-once batch ingestion (sinks/manifest.py).

Reference contract: IngestByTags + IngestIfNotExists (TextKustoSink.cs:48-63)
— re-delivery of an already-committed shard is a no-op, and a crash between
the data write and the manifest commit must not duplicate rows on retry
(stage-then-commit, Transforms/PartitionedContentSink.cs:101-132).
"""

import shutil

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.sinks.manifest import IngestManifest, ingest_idempotent


@pytest.fixture()
def sharded(spark):
    rows = [(src, f"{i % 2:05d}", i, f"payload-{src}-{i}") for src in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(
        rows, "src string, shard string, n long, payload string"
    )
    return (
        df.withColumnRenamed("src", "_kpf_source")
        .withColumnRenamed("shard", "_kpf_shard_id")
        .withColumn("_kpf_last_shard", F.col("_kpf_shard_id") == "00001")
    )


def test_ingest_second_call_is_noop(spark, tmp_path, sharded):
    manifest = IngestManifest(spark, str(tmp_path / "manifest"))
    dest = str(tmp_path / "dest")
    first = ingest_idempotent(sharded, manifest, dest)
    assert first.count() == 4  # 2 sources x 2 shards
    assert spark.read.parquet(dest).count() == 20

    second = ingest_idempotent(sharded, manifest, dest)
    assert second.count() == 0, "committed shards must be skipped"
    assert spark.read.parquet(dest).count() == 20


def test_ingest_crash_before_commit_retry_no_dup(spark, tmp_path, sharded):
    """Crash window: data written, manifest commit lost. The retry re-selects
    the same shards and must REPLACE their directories (dynamic partition
    overwrite on ingest_by), not append a second copy."""
    manifest_path = str(tmp_path / "manifest")
    manifest = IngestManifest(spark, manifest_path)
    dest = str(tmp_path / "dest")
    ingest_idempotent(sharded, manifest, dest)
    assert spark.read.parquet(dest).count() == 20

    shutil.rmtree(manifest_path)  # ≡ commit never landed
    retried = ingest_idempotent(sharded, manifest, dest)
    assert retried.count() == 4
    assert spark.read.parquet(dest).count() == 20, "retry must not duplicate rows"


def test_ingest_same_shard_id_different_sources_coexist(spark, tmp_path, sharded):
    """Partitioning must key on the full ingest_by (source-shard): ingesting
    source b after source a must not clobber a's same-numbered shard."""
    manifest = IngestManifest(spark, str(tmp_path / "manifest"))
    dest = str(tmp_path / "dest")
    a = sharded.filter(F.col("_kpf_source") == "a")
    b = sharded.filter(F.col("_kpf_source") == "b")
    ingest_idempotent(a, manifest, dest)
    ingest_idempotent(b, manifest, dest)
    out = spark.read.parquet(dest)
    assert out.count() == 20
    assert out.select("ingest_by").distinct().count() == 4


def test_drop_by_tag_retires_shards_and_reopens_ingestion(spark, tmp_path, sharded):
    """drop-by: shards ingested under a tag can be bulk-retired — data
    dirs deleted, manifest rows gone, and the SAME shards re-ingest
    afterwards (ingest-by no longer blocks them); other tags survive."""
    from kusto_pre_forge_spark.sinks.manifest import drop_by_tag

    manifest = IngestManifest(spark, str(tmp_path / "manifest"))
    dest = str(tmp_path / "dest")
    a = sharded.filter(F.col("_kpf_source") == "a")
    b = sharded.filter(F.col("_kpf_source") == "b")
    ingest_idempotent(a, manifest, dest, drop_by="backfill-bad")
    ingest_idempotent(b, manifest, dest, drop_by="backfill-good")
    assert spark.read.parquet(dest).count() == 20

    dropped = drop_by_tag(manifest, dest, "backfill-bad")
    assert sorted(dropped) == ["a-00000", "a-00001"]
    remaining = spark.read.parquet(dest)
    assert remaining.count() == 10
    assert {r.ingest_by for r in remaining.select("ingest_by").distinct().collect()} == {
        "b-00000", "b-00001",
    }
    assert manifest.read().count() == 2
    # dropping an unknown tag is a no-op
    assert drop_by_tag(manifest, dest, "no-such-tag") == []
    # the dropped shards re-ingest (corrected data) — no longer blocked
    again = ingest_idempotent(a, manifest, dest, drop_by="backfill-v2")
    assert again.count() == 2
    assert spark.read.parquet(dest).count() == 20


def test_observe_into_journal_piggybacks_on_the_action(spark):
    """Observation metrics ride the caller's own action (no extra scan)
    and land in the journal under the prefix."""
    from pyspark.sql import functions as F2

    from kusto_pre_forge_spark.journal import PerfJournal, observe_into_journal

    j = PerfJournal(sink=lambda _s: None)
    df = spark.range(0, 100).withColumn(
        "v", F2.when(F2.col("id") % 10 == 0, None).otherwise(F2.col("id"))
    )
    observed, flush = observe_into_journal(
        df,
        j,
        "Ingest",
        rows=F2.count(F2.lit(1)),
        null_v=F2.count(F2.when(F2.col("v").isNull(), 1)),
    )
    assert observed.count() == 100  # the caller's action
    got = flush()
    assert got == {"rows": 100, "null_v": 10}
    snap = j.snapshot()
    assert snap["Ingest.rows"] == 100 and snap["Ingest.null_v"] == 10


def test_manifest_compaction_crash_windows_recover(spark, tmp_path, sharded):
    """Every crash window of drop_by_tag's ledger swap recovers on the
    next read — at no point can a crash silently lose the committed-key
    ledger (which would reopen every shard for re-ingestion)."""
    import os

    # grace 0: this test IS the single crashed writer, so leftovers are
    # reclaimable immediately (the default 300 s grace protects against
    # a concurrent-writer misuse, exercised separately below)
    manifest = IngestManifest(
        spark, str(tmp_path / "manifest"), recover_grace_sec=0.0
    )
    dest = str(tmp_path / "dest")
    ingest_idempotent(sharded, manifest, dest)
    baseline = {r.ingest_by for r in manifest.read().collect()}
    assert len(baseline) == 4

    def snapshot(src, dst):
        shutil.copytree(src, dst)

    mpath = manifest.path
    # window A: compacted copy written, swap never began -> live ledger
    # wins, the stale .compact is discarded
    snapshot(mpath, mpath + ".compact")
    assert {r.ingest_by for r in manifest.read().collect()} == baseline
    assert not os.path.exists(mpath + ".compact")

    # window B: crash mid-swap (ledger renamed aside, compact complete
    # but not yet promoted) -> the compact is promoted
    snapshot(mpath, mpath + ".compact")
    os.rename(mpath, mpath + ".old")
    assert {r.ingest_by for r in manifest.read().collect()} == baseline
    assert os.path.exists(mpath)
    assert not os.path.exists(mpath + ".old")
    assert not os.path.exists(mpath + ".compact")

    # window C: crash after promotion, .old not yet deleted -> new ledger
    # wins, .old dropped
    snapshot(mpath, mpath + ".old")
    assert {r.ingest_by for r in manifest.read().collect()} == baseline
    assert not os.path.exists(mpath + ".old")

    # window D: only .old exists (compact lost with the crash) -> roll
    # back to the pre-compaction ledger; committed keys never vanish
    os.rename(mpath, mpath + ".old")
    assert {r.ingest_by for r in manifest.read().collect()} == baseline
    assert os.path.exists(mpath)

    # concurrent-writer safety net: with the DEFAULT grace, a FRESH
    # .compact (another process mid drop_by_tag) is NOT reclaimed by a
    # reader — only stale leftovers are garbage
    guarded = IngestManifest(spark, mpath)
    snapshot(mpath, mpath + ".compact")
    assert {r.ingest_by for r in guarded.read().collect()} == baseline
    assert os.path.exists(mpath + ".compact")  # left for its owner
    shutil.rmtree(mpath + ".compact")


def test_expire_ingest_tags_bounds_idempotency_window(spark, tmp_path, sharded):
    """The extent-tags retention analogue (templates/script.kql:5-18):
    expired ledger rows reopen their keys for re-ingestion (the
    documented duplicate-risk trade), fresh rows keep blocking, and the
    swap rides the same crash-safe protocol as drop_by_tag."""
    from kusto_pre_forge_spark.sinks.manifest import expire_ingest_tags

    manifest = IngestManifest(spark, str(tmp_path / "manifest"))
    dest = str(tmp_path / "dest")
    assert ingest_idempotent(sharded, manifest, dest).count() == 4
    assert ingest_idempotent(sharded, manifest, dest).count() == 0

    # nothing is older than 2h yet: expiry is a no-op
    assert expire_ingest_tags(manifest, 7200) == 0
    assert ingest_idempotent(sharded, manifest, dest).count() == 0

    # pin the clock 3h ahead: every row ages past the window
    import datetime

    future = datetime.datetime.now() + datetime.timedelta(hours=3)
    assert expire_ingest_tags(manifest, 7200, now=future.isoformat(" ")) == 4
    assert manifest.read().count() == 0
    # the keys are reopened — re-ingestion proceeds (and, because the
    # data write is dynamic partition overwrite on ingest_by, the data
    # itself does not duplicate)
    assert ingest_idempotent(sharded, manifest, dest).count() == 4
    assert spark.read.parquet(dest).count() == 20

    # legacy NULL committed_at rows are kept by default
    legacy = manifest.read().drop("committed_at")
    legacy.write.mode("overwrite").parquet(str(tmp_path / "legacy"))
    m2 = IngestManifest(spark, str(tmp_path / "legacy"))
    assert expire_ingest_tags(m2, 1, now=future.isoformat(" ")) == 0
    assert (
        expire_ingest_tags(
            m2, 1, now=future.isoformat(" "), treat_unknown_as_expired=True
        )
        == 4
    )
