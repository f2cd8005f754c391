import os

import pytest

from document_parsing_etl_pipeline_spark.sources import tableformat as tf


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"
    ).repartition(4, "doc_id")
    tf.create_table(spark, df, root, stats_cols=["doc_id"])
    return root


def test_create_append_and_time_travel(spark, table):
    assert tf.read(spark, table).count() == 100
    more = spark.range(100, 150).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"
    )
    v2 = tf.append(spark, more, table)
    assert tf.read(spark, table).count() == 150
    # old snapshot still intact
    assert tf.read(spark, table, version=1).count() == 100
    # timestamp travel: as-of v1's commit returns v1
    h = tf.history(table)
    assert [x["version"] for x in h] == [1, v2]
    assert tf.read(spark, table, as_of_us=h[0]["committed_us"]).count() == 100


def test_merge_rewrites_only_hit_files(spark, table):
    n_before = len(tf._load_manifest(table, 1)["files"])
    upd = spark.createDataFrame(
        [(3, "updated", 3), (999, "new", 5)],
        "doc_id long, text string, grp long",
    )
    tf.merge_into(spark, upd, table, key="doc_id")
    head = tf._load_manifest(table, 2)
    cur = tf.read(spark, table)
    assert cur.count() == 101
    rows = {r.doc_id: r.text for r in cur.where("doc_id in (3, 4, 999)").collect()}
    assert rows[3] == "updated" and rows[999] == "new"
    assert rows[4] == "t4"  # neighbors untouched
    # v1 time travel still shows the original value
    old = tf.read(spark, table, version=1)
    assert old.where("doc_id = 3").first().text == "t3"
    assert old.count() == 100
    # doc_id 0..99 round-robined over 4 files -> every file holds key 3?
    # repartition(4, doc_id) hashes: only files containing key 3 rewritten,
    # others carried by reference (path unchanged from v1)
    v1_paths = {e["path"] for e in tf._load_manifest(table, 1)["files"]}
    carried = {e["path"] for e in head["files"]} & v1_paths
    assert len(carried) == n_before - 1  # exactly one file held doc_id=3


def test_scan_prunes_files_by_manifest_stats(spark, tmp_path):
    root = str(tmp_path / "tbl2")
    # range-partitioned by doc_id -> disjoint per-file key ranges
    df = spark.range(0, 1000).selectExpr("id AS doc_id", "id * 2 AS v") \
        .repartitionByRange(8, "doc_id")
    tf.create_table(spark, df, root, stats_cols=["doc_id"])
    out, files_read, files_total = tf.scan(spark, root, "doc_id", 100, 120)
    assert files_total == 8 and files_read <= 2
    got = sorted(r.doc_id for r in out.collect())
    assert got == list(range(100, 121))
    # fully out-of-range scan reads zero files
    _, zero_read, _ = tf.scan(spark, root, "doc_id", 5000, 6000)
    assert zero_read == 0


def test_delete_where_drops_covered_files_without_reading(spark, tmp_path):
    root = str(tmp_path / "tbl3")
    df = spark.range(0, 1000).selectExpr("id AS doc_id", "id * 2 AS v") \
        .repartitionByRange(8, "doc_id")
    tf.create_table(spark, df, root, stats_cols=["doc_id"])
    v1_files = {e["path"] for e in tf._load_manifest(root, 1)["files"]}
    tf.delete_where(spark, root, "doc_id", 0, 130)
    head = tf._load_manifest(root, 2)
    cur = tf.read(spark, root)
    assert cur.count() == 1000 - 131
    assert cur.agg({"doc_id": "min"}).first()[0] == 131
    # the wholly-covered leading file(s) vanished by reference (no
    # rewrite artifact), boundary file rewritten under -del
    assert any("-del" in e["path"] for e in head["files"])
    assert len({e["path"] for e in head["files"]} & v1_files) < len(v1_files)
    # time travel unaffected
    assert tf.read(spark, root, version=1).count() == 1000


def test_commit_is_atomic_per_version(spark, table):
    # simulate a concurrent writer landing the same version number
    import json
    m = tf._load_manifest(table, 1)
    with pytest.raises(FileExistsError):
        fd = os.open(tf._manifest_path(table, 1),
                     os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        os.write(fd, json.dumps(m).encode())


def test_expire_snapshots_vacuums_orphans_only(spark, table):
    # build history: merge rewrites some v1 files, delete drops more —
    # v1's original files become orphans of the head snapshot
    upd = spark.createDataFrame(
        [(3, "updated", 3)], "doc_id long, text string, grp long"
    )
    tf.merge_into(spark, upd, table, key="doc_id")
    tf.delete_where(spark, table, "doc_id", 0, 10)
    head_rows = tf.read(spark, table).collect()
    head_files = {
        os.path.normpath(os.path.join(table, e["path"]))
        for e in tf._load_manifest(table, tf._versions(table)[-1])["files"]
    }

    out = tf.expire_snapshots(table, keep_last=1)
    assert out["expired_versions"] == [1, 2]
    assert out["kept_versions"] == [tf._versions(table)[-1]]
    # retained snapshot reads identically after the vacuum
    assert sorted(r.doc_id for r in tf.read(spark, table).collect()) == \
        sorted(r.doc_id for r in head_rows)
    # disk holds exactly the live file set — no orphans, nothing live
    # was removed
    on_disk = set()
    for dirpath, _d, files in os.walk(os.path.join(table, "data")):
        for fn in files:
            if fn.endswith(".parquet"):
                on_disk.add(os.path.normpath(os.path.join(dirpath, fn)))
    assert on_disk == head_files
    assert out["removed_files"] > 0
    # expired versions are gone (manifest absent)
    with pytest.raises(FileNotFoundError):
        tf._load_manifest(table, 1)


def test_expire_keeps_shared_files_of_retained_snapshots(spark, table):
    # append creates v2 sharing ALL of v1's files; keep_last=2 must
    # not remove anything
    more = spark.range(100, 120).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"
    )
    tf.append(spark, more, table)
    out = tf.expire_snapshots(table, keep_last=2)
    assert out["expired_versions"] == [] and out["removed_files"] == 0
    assert tf.read(spark, table, version=1).count() == 100
    assert tf.read(spark, table).count() == 120


def test_schema_evolution_append_new_column(spark, table):
    evolved = spark.range(200, 210).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp",
        "cast(id AS double) / 1000 AS quality",
    )
    tf.append(spark, evolved, table)
    head = tf.read(spark, table)
    assert "quality" in head.columns
    rows = {r.doc_id: r.quality for r in head.collect()}
    assert rows[205] == 0.205          # new rows carry the column
    assert rows[5] is None             # pre-evolution rows read as NULL
    # time travel to the pre-evolution snapshot: column absent
    assert "quality" not in tf.read(spark, table, version=1).columns


def test_optimize_compacts_and_zorder_tightens_stats(spark, tmp_path):
    root = str(tmp_path / "opt")
    base = spark.range(0, 200).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "(id * 37) % 100 AS grp"
    ).repartition(10)
    tf.create_table(spark, base, root, stats_cols=["doc_id", "grp"])
    n_before = len(tf._load_manifest(root, 1)["files"])
    assert n_before >= 8  # many small files

    v = tf.optimize_table(
        spark, root, target_file_rows=25, zorder=("doc_id", "grp")
    )
    head = tf._load_manifest(root, v)
    assert head["operation"] == "optimize"
    assert len(head["files"]) == 8  # 200 rows / 25 per file
    # content identical, pre-optimize snapshot intact
    assert sorted(r.doc_id for r in tf.read(spark, root).collect()) == \
        list(range(200))
    assert tf.read(spark, root, version=1).count() == 200

    # z-clustering makes doc_id file ranges narrow: a 10% doc_id box
    # must prune most files via manifest stats
    _df, files_read, files_total = tf.scan(spark, root, "doc_id", 40, 59)
    assert files_total == 8
    assert files_read < files_total
    # and grp stats are tight too (each file spans far less than the
    # full 0..99 domain on average)
    spans = [
        e["stats"]["grp"][1] - e["stats"]["grp"][0] for e in head["files"]
    ]
    assert sum(spans) / len(spans) < 99


def test_merge_into_empty_table_uses_recorded_schema(spark, tmp_path):
    # the CDC-sink bootstrap pattern: create a typed EMPTY table, then
    # MERGE the first batch in. Regression: read() of an empty
    # snapshot used a hardcoded fallback schema and broke the merge.
    root = str(tmp_path / "empty_tbl")
    seed = spark.createDataFrame(
        [], "user_id long, state string, seq long"
    )
    tf.create_table(spark, seed, root, stats_cols=["user_id"])
    empty = tf.read(spark, root)
    assert empty.columns == ["user_id", "state", "seq"]
    assert empty.count() == 0

    first = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11)], "user_id long, state string, seq long"
    )
    tf.merge_into(spark, first, root, key="user_id")
    got = {r.user_id: r.state for r in tf.read(spark, root).collect()}
    assert got == {1: "a", 2: "b"}
