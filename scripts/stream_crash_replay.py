"""Crash-replay probe for the streaming crawl ingest's EXACTLY-ONCE
claim (VERDICT r11 #3): q_stream_crawl_ingest's correctness rests on
the transactional file sink — at-least-once appends would change
exact-dedup groups, and that is the one failure mode the batch-parity
oracle cannot see.

The probe:
  1. builds ONE crawl fixture and drains it uninterrupted -> store A;
  2. spawns a SUBPROCESS that starts the same ingest against store B
     (maxFilesPerTrigger=8 -> 4 micro-batches) and HARD-KILLS itself
     with os._exit(1) the moment the first micro-batch commits — a
     real crash, not a graceful stop, so batch 1 may die mid-write and
     leave orphan part files on disk;
  3. restarts from the checkpoint with availableNow and drains;
  4. verifies: raw store-B row count == store-A row count (no
     duplicated or lost curated rows), the post-splice deduped corpus
     digests are byte-identical, and any orphan part files on disk are
     invisible to readers (the _spark_metadata manifest is the source
     of truth, not the directory listing).

Usage:
    python scripts/stream_crash_replay.py [sf_dir]          # orchestrate
    python scripts/stream_crash_replay.py --crash FIX STORE CK
                                                            # (internal)
"""

from __future__ import annotations

import glob
import hashlib
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ingest_stream(spark, fixture: str, store: str, ck: str,
                   files_per_trigger: int = 8):
    """The q_stream_crawl_ingest front half, verbatim shape."""
    from metadata_enhanced_pretrain_datapipeline_spark.queries import _crawl_curate
    from metadata_enhanced_pretrain_datapipeline_spark.sources import readers

    stream = (
        spark.readStream.format("binaryFile")
        .schema(readers.BINARY_FILE_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .load(fixture))
    curated = _crawl_curate(readers.parse_warc_records(stream))
    return (curated.writeStream.format("parquet")
            .option("path", store)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start())


def _corpus_digest(spark, store: str) -> tuple[int, str]:
    """(raw committed row count, digest of the post-splice deduped
    corpus) — the digest replays the batch chain's dedup tail so a
    duplicated curated row provably changes it."""
    from metadata_enhanced_pretrain_datapipeline_spark.checkpointing import materialize
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    raw = spark.read.parquet(store)
    n_raw = raw.count()
    corpus = materialize(dedup.dedup_exact_text(raw.repartition(32)),
                         eager=False)
    final = dedup.minhash_dedup(
        corpus, num_hashes=8, bands=4, shingle_n=3,
        max_bucket_size=64, portable=True).select("doc_id", "text")
    rows = sorted(f"{r.doc_id}|{r.text}" for r in final.collect())
    return n_raw, hashlib.md5("\n".join(rows).encode()).hexdigest()


def crash_phase(fixture: str, store: str, ck: str) -> None:
    """Start the ingest and die NON-gracefully right after the first
    micro-batch commits."""
    from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

    spark = get_spark("crash-replay-victim")
    q = _ingest_stream(spark, fixture, store, ck)
    deadline = time.time() + 300
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["numInputRows"] > 0:
            # batch 0 committed — give batch 1 a beat to get mid-write
            # (MEP_CRASH_DELAY seconds), then die NOW; a torn batch-1
            # file on disk is exactly the orphan the manifest must hide
            time.sleep(float(os.environ.get("MEP_CRASH_DELAY", "0")))
            os._exit(1)
        time.sleep(0.05)
    os._exit(2)  # never committed anything: probe setup failure


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--crash":
        crash_phase(*sys.argv[2:5])
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import shutil
    import tempfile

    from metadata_enhanced_pretrain_datapipeline_spark.queries import _build_crawl_fixture
    from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

    spark = get_spark("crash-replay")
    fixture = _build_crawl_fixture(spark, sf_dir, "crash_replay")
    work = tempfile.mkdtemp(prefix="mep_crash_replay_")
    store_a, ck_a = f"{work}/store_a", f"{work}/ck_a"
    store_b, ck_b = f"{work}/store_b", f"{work}/ck_b"

    # ---- run A: uninterrupted
    _ingest_stream(spark, fixture, store_a, ck_a).awaitTermination()
    n_a, dig_a = _corpus_digest(spark, store_a)
    print(f"A uninterrupted: raw_rows={n_a} digest={dig_a}")

    # ---- run B phase 1: crash after first commit (separate JVM)
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--crash",
         fixture, store_b, ck_b],
        env={**os.environ, "SPARK_GRAFT_CPUS":
             os.environ.get("SPARK_GRAFT_CPUS", "8")},
        timeout=600).returncode
    print(f"B crash phase exited rc={rc} (1 = died after first commit)")
    assert rc == 1, "victim never committed a batch"
    import duckdb

    committed_mid = spark.read.parquet(store_b).count()
    files_mid = glob.glob(f"{store_b}/part-*")
    # every readable row on disk, manifest ignored (a file the crash
    # truncated mid-write is skipped — it isn't valid parquet yet)
    disk_mid = 0
    for f in files_mid:
        try:
            disk_mid += duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet('{f}')").fetchone()[0]
        except Exception:
            pass  # torn file: unreadable, also invisible to the sink
    print(f"B mid-crash: committed_rows={committed_mid} "
          f"part_files_on_disk={len(files_mid)} "
          f"readable_rows_on_disk={disk_mid} "
          f"orphaned_rows_at_crash={disk_mid - committed_mid}")
    assert 0 < committed_mid < n_a, "crash landed outside a partial state"

    # ---- run B phase 2: restart from the checkpoint, drain
    _ingest_stream(spark, fixture, store_b, ck_b).awaitTermination()
    n_b, dig_b = _corpus_digest(spark, store_b)
    files_end = len(glob.glob(f"{store_b}/part-*"))
    # manifest-vs-directory: reading the DIRECTORY raw (every part
    # file, manifest ignored) counts every byte the crash left behind;
    # the manifest read (spark.read on the sink dir) is what consumers
    # see — if the crash orphaned a partial batch-1 file, raw > manifest
    # and the sink still reads exactly-once
    import duckdb

    raw_rows = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{store_b}/part-*')"
    ).fetchone()[0]
    print(f"B resumed: raw_rows={n_b} digest={dig_b} "
          f"part_files_on_disk={files_end} "
          f"rows_in_all_disk_files={raw_rows} "
          f"orphaned_rows={raw_rows - n_b}")

    # deterministic orphan proof: plant a duplicate part file the sink
    # manifest does not know about (what a non-transactional
    # at-least-once append would leave behind) — the manifest read must
    # not see it, the raw directory read must
    donor = sorted(glob.glob(f"{store_b}/part-*"))[0]
    orphan = f"{store_b}/part-99999-orphan-replay.snappy.parquet"
    shutil.copyfile(donor, orphan)
    n_with_orphan = spark.read.parquet(store_b).count()
    raw_with_orphan = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{store_b}/part-*')"
    ).fetchone()[0]
    print(f"planted orphan: manifest_read={n_with_orphan} "
          f"raw_dir_read={raw_with_orphan}")

    ok = (n_a == n_b) and (dig_a == dig_b) and \
        n_with_orphan == n_b and raw_with_orphan > raw_rows
    print(f"EXACTLY-ONCE: rows_match={n_a == n_b} "
          f"digest_match={dig_a == dig_b} "
          f"planted_orphan_ignored={n_with_orphan == n_b}")
    shutil.rmtree(work, ignore_errors=True)
    if not ok:
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
