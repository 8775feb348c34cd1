"""FASTQ scan, doc store, simplified expansion, streaming rollups."""

from __future__ import annotations

import shutil

import pytest

import pyspark.sql.functions as F

from conftest import SF_SMOKE


def test_parse_barcodes(spark, tmp_path):
    from mmeds_meta_spark.sources.fastq import barcode_error_counts, parse_barcodes

    reads = [("GATTACAG", 3), ("CATTACAG", 2), ("GATTACAT", 1)]
    p = tmp_path / "reads.fastq"
    with open(p, "w") as f:
        i = 0
        for bc, n in reads:
            for _ in range(n):
                f.write(f"@read{i}\n{bc}TTTTCCCCGGGG\n+\n{'I' * 20}\n")
                i += 1
    counts = parse_barcodes(spark, str(p), barcode_length=8)
    got = {r.barcode: r.n_reads for r in counts.collect()}
    assert got == {"GATTACAG": 3, "CATTACAG": 2, "GATTACAT": 1}
    expected = spark.createDataFrame([("GATTACAG",)], "expected_barcode string")
    errs = barcode_error_counts(counts, expected, max_distance=1)
    by_dist = {r.dist: r.n_reads for r in errs.collect()}
    assert by_dist == {0: 3, 1: 3}  # exact + the two 1-off barcodes


def test_doc_store(spark, tmp_path):
    from mmeds_meta_spark.sources.docs import DocStore

    store = DocStore(spark, str(tmp_path / "docs"))
    idx = tmp_path / "file_index.tsv"
    store.save(
        {
            "doc_type": "study",
            "owner": "ada",
            "study_name": "StudyAlpha",
            "access_code": "c0de",
            "files": {"metadata": "/data/meta.tsv", "otu": "/data/otu.tsv"},
            "config": {"sampling_depth": "1000"},
            "file_index_path": str(idx),
        }
    )
    store.save({"doc_type": "analysis", "owner": "ada", "study_name": "StudyAlpha"})
    doc = store.get_doc(access_code="c0de", owner="ada")
    assert doc and doc["study_name"] == "StudyAlpha"
    assert store.get_doc(access_code="wrong") is None
    assert store.get_all_studies("ada").count() == 1
    assert store.get_all_analyses_from_study("StudyAlpha").count() == 1
    assert store.get_metadata_file_location("StudyAlpha", "ada") == "/data/meta.tsv"
    assert idx.read_text().splitlines() == ["metadata\t/data/meta.tsv", "otu\t/data/otu.tsv"]


def test_simplified_to_full(spark, tmp_path):
    from fixtures import write_subject
    from mmeds_meta_spark.sources.metadata_tsv import read_header
    from mmeds_meta_spark.sources.simplified import simplified_to_full

    template = read_header(str(write_subject(tmp_path)))
    df = spark.createDataFrame(
        [("HS-000", "Human"), ("HS-001", "Human")], "SubjectID string, Type string"
    )
    full, meta = simplified_to_full(df, template)
    assert set(m.flat for m in template) == set(full.columns)
    rows = full.collect()
    assert {r["Subjects__HostSubjectId"] for r in rows} == {"HS-000", "HS-001"}
    assert all(r["Heights__Height"] is None for r in rows)


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_rollup_matches_batch(spark, events_dir, tmp_path):
    from mmeds_meta_spark.streaming import streaming_event_rollup

    q = (
        streaming_event_rollup(spark, events_dir)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM rollup_test").collect()
    # append mode emits only watermark-closed windows; with availableNow on a
    # finite feed the last window stays open, so compare against the batch
    # aggregate restricted to emitted windows
    from mmeds_meta_spark.functions.event_time import event_ts

    raw = spark.read.parquet(events_dir)
    batch = (
        raw.withColumn("event_ts", event_ts(raw.schema))
        .groupBy(F.window("event_ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    batch_map = {(r.w.start, r.event_type): r.n_events for r in batch.collect()}
    assert got, "no closed windows emitted"
    for r in got:
        assert batch_map[(r.window_start, r.event_type)] == r.n_events


def test_streaming_dedup(spark, events_dir, tmp_path):
    from mmeds_meta_spark.streaming import streaming_exact_dedup

    q = (
        streaming_exact_dedup(spark, events_dir)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT COUNT(DISTINCT event_id) AS n FROM dedup_test").first().n
    total = spark.sql("SELECT COUNT(*) AS n FROM dedup_test").first().n
    assert n == total  # no duplicate event_ids pass through
    assert total == spark.read.parquet(events_dir).select("event_id").distinct().count()


def test_streaming_stateful_sessionize(spark, events_dir, tmp_path):
    from mmeds_meta_spark.streaming.stateful import streaming_sessionize

    q = (
        streaming_sessionize(spark, events_dir)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sess_test").collect()
    assert got, "no sessions emitted"
    # closed sessions only, exactly once per (user, session_start)
    seen = set()
    for r in got:
        assert r.session_start_us <= r.session_end_us
        assert r.n_events >= 1
        key = (r.user_id, r.session_start_us)
        assert key not in seen, f"session emitted twice: {key}"
        seen.add(key)
    # closed-session event totals never exceed the user's true event count
    import collections

    ev = spark.read.parquet(events_dir)
    per_user = {r.user_id: r.cnt for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    by_user = collections.defaultdict(int)
    for r in got:
        by_user[r.user_id] += r.n_events
    for u, n in by_user.items():
        assert n <= per_user[u], (u, n, per_user[u])


def test_streaming_enrich_matches_batch_join(spark, events_dir, tmp_path):
    from mmeds_meta_spark.streaming import streaming_enrich

    q = (
        streaming_enrich(spark, events_dir, SF_SMOKE)
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: (r.segment, r.nation) for r in spark.sql("SELECT * FROM enrich_test").collect()}
    raw = spark.read.parquet(events_dir)
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    batch = (
        raw.join(cust, raw.user_id == cust.c_custkey, "left")
        .join(nation, cust.c_nationkey == nation.n_nationkey, "left")
        .select("event_id", F.col("c_mktsegment").alias("segment"), F.col("n_name").alias("nation"))
    )
    expected = {r.event_id: (r.segment, r.nation) for r in batch.collect()}
    assert got == expected
    # at least some events must actually enrich (custkey range overlap)
    assert any(v[0] is not None for v in got.values())
