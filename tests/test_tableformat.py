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


def test_merge_into_empty_updates_is_safe(spark, table):
    # streaming foreachBatch delivers zero-row batches; merge_into
    # must not compare None key bounds against file stats
    empty = spark.createDataFrame([], "doc_id long, text string, grp long")
    v = tf.merge_into(spark, empty, table, key="doc_id")
    head = tf._load_manifest(table, v)
    v1_paths = {e["path"] for e in tf._load_manifest(table, 1)["files"]}
    # every original file carried by reference, nothing rewritten
    assert v1_paths <= {e["path"] for e in head["files"]}
    assert tf.read(spark, table).count() == 100


def test_merge_batch_short_circuits_empty_batch(spark, table):
    from document_parsing_etl_pipeline_spark.streaming import table_sink as ts

    empty = spark.createDataFrame([], "doc_id long, text string, grp long")
    v_before = tf._versions(table)[-1]
    assert ts.merge_batch(spark, empty, table, "doc_id", "grp", 0) is False
    assert tf._versions(table)[-1] == v_before  # no commit
    assert ts.last_committed_batch(table) == -1


def test_stream_batch_id_survives_maintenance_commits(spark, table):
    # exactly-once watermark must ride along delete/optimize/append
    # commits and survive expire_snapshots of the manifest that first
    # recorded it
    from document_parsing_etl_pipeline_spark.streaming import table_sink as ts

    upd = spark.createDataFrame(
        [(3, "u", 3)], "doc_id long, text string, grp long"
    )
    assert ts.merge_batch(spark, upd, table, "doc_id", "grp", 7) is True
    tf.delete_where(spark, table, "doc_id", 0, 10)
    tf.optimize_table(spark, table, target_file_rows=50)
    more = spark.range(500, 510).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"
    )
    tf.append(spark, more, table)
    tf.expire_snapshots(table, keep_last=1)
    assert ts.last_committed_batch(table) == 7
    # a checkpoint replay of batch 7 is still skipped
    assert ts.merge_batch(spark, upd, table, "doc_id", "grp", 7) is False


def test_scan_merges_schemas_across_evolution(spark, tmp_path):
    root = str(tmp_path / "scan_evo")
    base = spark.range(0, 100).selectExpr("id AS doc_id", "id * 2 AS v") \
        .repartitionByRange(4, "doc_id")
    tf.create_table(spark, base, root, stats_cols=["doc_id"])
    evolved = spark.range(100, 200).selectExpr(
        "id AS doc_id", "id * 2 AS v", "cast(id AS double) AS quality"
    ).repartitionByRange(4, "doc_id")
    tf.append(spark, evolved, root)
    # a scan spanning pre- and post-evolution files must surface the
    # evolved column (NULL for old files), same as read()
    out, files_read, _ = tf.scan(spark, root, "doc_id", 90, 110)
    assert "quality" in out.columns
    rows = {r.doc_id: r.quality for r in out.collect()}
    assert rows[95] is None and rows[105] == 105.0
    # empty-prune branch returns the same schema
    empty, zero, _ = tf.scan(spark, root, "doc_id", 10_000, 20_000)
    assert zero == 0 and set(empty.columns) == set(out.columns)


def test_append_narrower_df_does_not_narrow_recorded_schema(spark, table):
    # table has (doc_id, text, grp); append a df lacking `grp`
    narrow = spark.range(300, 310).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    )
    tf.append(spark, narrow, table)
    head = tf._load_manifest(table, tf._versions(table)[-1])
    import json as _json
    names = [f["name"] for f in _json.loads(head["schema"])["fields"]]
    assert names == ["doc_id", "text", "grp"]
    got = tf.read(spark, table)
    assert set(got.columns) == {"doc_id", "text", "grp"}
    assert got.where("doc_id = 305").first().grp is None


def test_zorder_on_double_and_three_dims(spark, tmp_path):
    # DOUBLE z-column with a sub-1.0 range used to fail analysis /
    # collapse to one bucket; 3-dim interleave is the Delta claim
    root = str(tmp_path / "zdbl")
    base = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        "cast((id * 37) % 100 AS double) / 1000 AS score",  # range 0.099
        "(id * 13) % 50 AS grp",
    ).repartition(8)
    tf.create_table(spark, base, root, stats_cols=["doc_id", "score", "grp"])
    v = tf.optimize_table(
        spark, root, target_file_rows=50,
        zorder=("doc_id", "score", "grp"),
    )
    head = tf._load_manifest(root, v)
    assert len(head["files"]) == 8
    assert sorted(r.doc_id for r in tf.read(spark, root).collect()) == \
        list(range(400))
    # clustering must be real in EVERY dimension: mean per-file span
    # well under the full domain for all three columns
    for col, domain in (("doc_id", 399), ("score", 0.099), ("grp", 49)):
        spans = [
            e["stats"][col][1] - e["stats"][col][0] for e in head["files"]
        ]
        assert sum(spans) / len(spans) < domain, col


def test_interleave_bits_nd_matches_sql_oracle(spark):
    import duckdb

    from document_parsing_etl_pipeline_spark.operators.layout import (
        interleave_bits_nd, interleave_bits_nd_sql,
    )

    df = spark.range(0, 256).selectExpr(
        "id % 16 AS a", "(id * 7) % 16 AS b", "(id * 3) % 16 AS c"
    )
    got = [
        r.z for r in df.select(
            interleave_bits_nd(["a", "b", "c"], 4).alias("z")
        ).orderBy("z").collect()
    ]
    frag = interleave_bits_nd_sql(["a", "b", "c"], 4)
    want = [
        r[0] for r in duckdb.sql(
            "SELECT " + frag + " AS z FROM ("
            "SELECT i % 16 AS a, (i * 7) % 16 AS b, (i * 3) % 16 AS c "
            "FROM range(256) t(i)) ORDER BY z"
        ).fetchall()
    ]
    assert got == want


def test_table_changes_merge_update_and_insert(spark, table):
    upd = spark.createDataFrame(
        [(3, "updated", 3), (999, "new", 5)],
        "doc_id long, text string, grp long",
    )
    v2 = tf.merge_into(spark, upd, table, key="doc_id")
    ch = tf.table_changes(spark, table, 1, v2, key="doc_id")
    got = {(r._change_type, r.doc_id) for r in ch.collect()}
    # neighbors rewritten into new files are NOT logical changes
    assert got == {
        ("insert", 999),
        ("update_preimage", 3),
        ("update_postimage", 3),
    }
    pre = {r.text for r in ch.where("_change_type = 'update_preimage'").collect()}
    post = {r.text for r in ch.where("_change_type = 'update_postimage'").collect()}
    assert pre == {"t3"} and post == {"updated"}


def test_table_changes_delete_and_pure_rewrite(spark, tmp_path):
    root = str(tmp_path / "cdf")
    df = spark.range(0, 200).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).repartitionByRange(4, "doc_id")
    tf.create_table(spark, df, root, stats_cols=["doc_id"])
    v2 = tf.delete_where(spark, root, "doc_id", 0, 9)
    ch = tf.table_changes(spark, root, 1, v2)
    got = {(r._change_type, r.doc_id) for r in ch.collect()}
    assert got == {("delete", i) for i in range(10)}
    # OPTIMIZE rewrites every row into new files: zero logical changes
    v3 = tf.optimize_table(spark, root, target_file_rows=100)
    assert tf.table_changes(spark, root, v2, v3).count() == 0
    # and across the whole history, deletes still surface
    assert tf.table_changes(spark, root, 1, v3).count() == 10


def test_expectations_split_and_quarantined_append(spark, table, tmp_path):
    q_root = str(tmp_path / "quarantine")
    batch = spark.createDataFrame(
        [
            (500, "fine text", 2),
            (501, "", 3),            # fails nonempty_text
            (502, "ok", None),       # fails grp_present (NULL != pass)
            (503, "", None),         # fails both
        ],
        "doc_id long, text string, grp long",
    )
    out = tf.append_with_expectations(
        spark, batch, table,
        expectations={
            "nonempty_text": "length(text) > 0",
            "grp_present": "grp IS NOT NULL",
        },
        quarantine_root=q_root,
    )
    assert out["n_clean"] == 1 and out["n_quarantined"] == 3
    cur = tf.read(spark, table)
    assert cur.where("doc_id >= 500").count() == 1  # only 500 landed
    q = {r.doc_id: r._violated for r in tf.read(spark, q_root).collect()}
    assert q[501] == "nonempty_text"
    assert q[502] == "grp_present"
    assert q[503] == "nonempty_text,grp_present"
    # second gated append APPENDS to the existing quarantine table
    out2 = tf.append_with_expectations(
        spark,
        spark.createDataFrame(
            [(504, "", 1)], "doc_id long, text string, grp long"
        ),
        table,
        expectations={"nonempty_text": "length(text) > 0"},
        quarantine_root=q_root,
    )
    assert out2["n_quarantined"] == 1
    assert tf.read(spark, q_root).count() == 4


def test_write_audit_publish_flow(spark, table):
    good = spark.createDataFrame(
        [(600, "staged row", 1)], "doc_id long, text string, grp long"
    )
    out = tf.stage_append(spark, good, table, stage="nightly")
    # main is untouched while staged
    assert tf.read(spark, table).where("doc_id = 600").count() == 0
    # audit sees the candidate snapshot AND the delta alone
    assert tf.read_staged(spark, table, "nightly").count() == 101
    delta = tf.read_staged_delta(spark, table, "nightly")
    assert [r.doc_id for r in delta.collect()] == [600]
    clean, viol = tf.validate_expectations(
        delta, {"nonempty": "length(text) > 0"}
    )
    assert viol.count() == 0
    v = tf.publish_stage(table, "nightly")
    assert tf.read(spark, table).where("doc_id = 600").count() == 1
    assert tf.read(spark, table, version=out["base_version"]).count() == 100


def test_publish_refuses_on_base_drift_and_discard_removes_files(
    spark, table
):
    import os as _os

    import pytest as _pytest

    staged = spark.createDataFrame(
        [(700, "candidate", 1)], "doc_id long, text string, grp long"
    )
    tf.stage_append(spark, staged, table, stage="wap")
    # main advances underneath the stage
    tf.append(spark, spark.createDataFrame(
        [(701, "interleaved", 2)], "doc_id long, text string, grp long"
    ), table)
    with _pytest.raises(RuntimeError, match="re-stage"):
        tf.publish_stage(table, "wap")
    removed = tf.discard_stage(table, "wap")
    assert removed >= 1
    assert not _os.path.exists(tf._stage_path(table, "wap"))
    # the interleaved commit is intact; candidate rows never published
    cur = tf.read(spark, table)
    assert cur.where("doc_id = 701").count() == 1
    assert cur.where("doc_id = 700").count() == 0


def test_table_changes_across_schema_evolution_boundary(spark, tmp_path):
    """Regression (round-7 advisor): a change feed whose from-only
    files ALL predate a schema-evolution append must not raise — the
    delta files are read with the manifest-recorded schema, so
    pre-evolution files surface the added column as typed NULLs."""
    root = str(tmp_path / "cdf_evo")
    df = spark.range(0, 20).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).coalesce(1)
    tf.create_table(spark, df, root, stats_cols=["doc_id"])        # v1
    evolved = spark.range(100, 110).selectExpr(
        "id AS doc_id", "concat('t', id) AS text",
        "cast(id AS double) / 1000 AS quality",
    )
    v2 = tf.append(spark, evolved, root)                            # v2
    # delete rewrites the PRE-evolution v1 file; post-rewrite survivors
    # carry the evolved schema, so only_f = pre-evolution files only
    v3 = tf.delete_where(spark, root, "doc_id", 0, 4)
    ch = tf.table_changes(spark, root, v2, v3)
    assert "quality" in ch.columns
    got = {(r._change_type, r.doc_id, r.quality) for r in ch.collect()}
    assert got == {("delete", i, None) for i in range(5)}
    # keyed variant across the same boundary also reads clean
    chk = tf.table_changes(spark, root, v2, v3, key="doc_id")
    assert {r.doc_id for r in chk.collect()} == set(range(5))


def test_branch_isolated_from_main(spark, table):
    """Branch appends never appear on main; main appends never appear
    on the branch; both lineages time-travel independently."""
    tf.create_branch(table, "dev")
    dev_rows = spark.range(1000, 1020).selectExpr(
        "id AS doc_id", "concat('d', id) AS text", "id % 7 AS grp")
    tf.append_to_branch(spark, dev_rows, table, "dev")
    assert tf.read_branch(spark, table, "dev").count() == 120
    assert tf.read(spark, table).count() == 100       # main untouched
    # branch time travel: b1 is the base snapshot
    assert tf.read_branch(spark, table, "dev", branch_version=1).count() == 100
    refs = tf.list_refs(table)
    assert refs["branches"] == {"dev": 2}


def test_fast_forward_merges_and_refuses_divergence(spark, table):
    tf.create_branch(table, "dev")
    tf.append_to_branch(
        spark,
        spark.range(1000, 1010).selectExpr(
            "id AS doc_id", "concat('d', id) AS text", "id % 7 AS grp"),
        table, "dev")
    v = tf.fast_forward(table, "dev")
    assert tf.read(spark, table).count() == 110
    assert tf.read(spark, table, version=v - 1).count() == 100
    # divergence: a branch based on the OLD head cannot fast-forward
    tf.create_branch(table, "dev2", version=v - 1)
    tf.append_to_branch(
        spark,
        spark.range(2000, 2005).selectExpr(
            "id AS doc_id", "concat('x', id) AS text", "id % 7 AS grp"),
        table, "dev2")
    with pytest.raises(RuntimeError, match="fast_forward refused"):
        tf.fast_forward(table, "dev2")


def test_expire_respects_branch_and_tag_refs(spark, table):
    """A tag pins its main version through expiry; branch-only files
    survive vacuum while the branch exists and are reclaimed after
    delete_branch."""
    more = spark.range(100, 130).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp")
    v2 = tf.append(spark, more, table)
    tf.create_tag(table, "release-1", version=1)
    tf.create_branch(table, "dev")
    tf.append_to_branch(
        spark,
        spark.range(3000, 3010).selectExpr(
            "id AS doc_id", "concat('b', id) AS text", "id % 7 AS grp"),
        table, "dev")
    tf.append(spark, spark.range(130, 140).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"),
        table)
    res = tf.expire_snapshots(table, keep_last=1)
    # v1 pinned by the tag -> kept; v2 expired
    assert 1 in res["kept_versions"] and v2 in res["expired_versions"]
    assert tf.read_tag(spark, table, "release-1").count() == 100
    # branch still fully readable (base v2's 130 rows + 10 branch
    # rows): its unique files AND its base's files survived vacuum
    # even though v2 itself was expired from main
    assert tf.read_branch(spark, table, "dev").count() == 140
    # drop the refs -> next expire reclaims what only they referenced
    tf.delete_branch(table, "dev")
    tf.delete_tag(table, "release-1")
    res2 = tf.expire_snapshots(table, keep_last=1)
    assert res2["removed_files"] > 0
    with pytest.raises(ValueError):
        tf.read_tag(spark, table, "release-1")


def test_branch_schema_evolution_isolated(spark, table):
    """A column added on a branch exists there (old rows NULL) and
    does NOT leak into main until fast-forward."""
    tf.create_branch(table, "schema-dev")
    wider = spark.range(5000, 5005).selectExpr(
        "id AS doc_id", "concat('w', id) AS text", "id % 7 AS grp",
        "id * 2 AS extra")
    tf.append_to_branch(spark, wider, table, "schema-dev")
    bdf = tf.read_branch(spark, table, "schema-dev")
    assert "extra" in bdf.columns
    assert bdf.where("extra IS NOT NULL").count() == 5
    assert "extra" not in tf.read(spark, table).columns
    v = tf.fast_forward(table, "schema-dev")
    assert "extra" in tf.read(spark, table, version=v).columns


# ------------------------------------------------- deletion vectors

@pytest.fixture()
def dv_table(spark, tmp_path):
    """Range-clustered table: 4 files with disjoint doc_id ranges
    (~[0,24],[25,49],[50,74],[75,99])."""
    root = str(tmp_path / "dvtbl")
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).repartitionByRange(4, "doc_id")
    tf.create_table(spark, df, root, stats_cols=["doc_id"])
    return root


def test_delete_dv_tombstones_without_rewrite(spark, dv_table):
    """delete_where_dv removes rows from reads WITHOUT rewriting the
    overlapping files (their manifest paths carry over identically);
    wholly-covered files still drop by reference; time travel to the
    pre-delete snapshot resurrects everything."""
    v1_files = {e["path"] for e in tf._load_manifest(dv_table, 1)["files"]}
    v2 = tf.delete_where_dv(spark, dv_table, "doc_id", 10, 60)
    head = tf._load_manifest(dv_table, v2)
    # live rows: 0-9 and 61-99
    got = sorted(r.doc_id for r in tf.read(spark, dv_table).collect())
    assert got == list(range(0, 10)) + list(range(61, 100))
    # no rewrite: every surviving file path existed in v1
    assert {e["path"] for e in head["files"]} <= v1_files
    # the wholly-covered middle file dropped by reference
    assert len(head["files"]) == len(v1_files) - 1
    assert tf._dv_entries(head)  # tombstones recorded
    # tombstone count == rows deleted from carried files (10..24, 50..60)
    assert sum(e["rows"] for e in tf._dv_entries(head)) == 15 + 11
    # time travel: pre-delete snapshot unaffected
    assert tf.read(spark, dv_table, version=1).count() == 100
    # scan() applies the tombstones too
    df, _, _ = tf.scan(spark, dv_table, "doc_id", 0, 30)
    assert sorted(r.doc_id for r in df.collect()) == list(range(0, 10))


def test_delete_dv_stacks_and_merge_respects_tombstones(spark, dv_table):
    """A second DV delete stacks onto the first; a MERGE touching a
    tombstoned file neither resurrects tombstoned rows nor counts
    them as matches."""
    tf.delete_where_dv(spark, dv_table, "doc_id", 0, 3)
    tf.delete_where_dv(spark, dv_table, "doc_id", 5, 6)
    got = sorted(r.doc_id for r in tf.read(spark, dv_table).collect())
    assert got == [4] + list(range(7, 100))
    # MERGE updates doc_id 7 (same file as the tombstoned 0-6 rows)
    upd = spark.createDataFrame(
        [(7, "updated")], "doc_id long, text string")
    tf.merge_into(spark, upd, dv_table, key="doc_id")
    cur = tf.read(spark, dv_table)
    assert cur.count() == 94
    assert cur.where("doc_id = 7").first().text == "updated"
    # tombstoned rows stay gone after the rewrite
    assert cur.where("doc_id <= 3 OR doc_id IN (5, 6)").count() == 0
    assert cur.where("doc_id = 4").first().text == "t4"


def test_optimize_materializes_dv_and_vacuum_reclaims(spark, dv_table):
    """OPTIMIZE materializes tombstones (head carries an empty
    delete_vectors list, reads unchanged); once the DV snapshots
    expire, vacuum reclaims the sidecar files."""
    tf.delete_where_dv(spark, dv_table, "doc_id", 10, 60)
    before = sorted(r.doc_id for r in tf.read(spark, dv_table).collect())
    v3 = tf.optimize_table(spark, dv_table, target_file_rows=50)
    head = tf._load_manifest(dv_table, v3)
    assert tf._dv_entries(head) == []
    after = sorted(r.doc_id for r in tf.read(spark, dv_table).collect())
    assert after == before
    res = tf.expire_snapshots(dv_table, keep_last=1)
    assert res["removed_files"] > 0  # pre-optimize data + dv sidecars
    # no dv parquet remains anywhere under data/
    leftover = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(os.path.join(dv_table, "data"))
        for f in fs if "-dv" in dp and f.endswith(".parquet")
    ]
    assert leftover == []
    assert sorted(
        r.doc_id for r in tf.read(spark, dv_table).collect()
    ) == before


def test_vacuum_keeps_dv_sidecars_of_retained_snapshots(spark, dv_table):
    """A retained snapshot's tombstones are live content: vacuum must
    not remove them (else its rows silently resurrect)."""
    v2 = tf.delete_where_dv(spark, dv_table, "doc_id", 10, 60)
    tf.append(spark, spark.createDataFrame(
        [(200, "t200")], "doc_id long, text string"), dv_table)
    tf.expire_snapshots(dv_table, keep_last=2)  # keeps v2 + v3
    assert sorted(
        r.doc_id for r in tf.read(spark, dv_table, version=v2).collect()
    ) == list(range(0, 10)) + list(range(61, 100))
    assert tf.read(spark, dv_table).count() == 50


def test_table_changes_reports_dv_deletes(spark, dv_table):
    """CDF across a DV commit reports exactly the tombstoned rows as
    deletes; CDF across the materializing OPTIMIZE reports nothing
    (the live rowset is unchanged)."""
    v2 = tf.delete_where_dv(spark, dv_table, "doc_id", 95, 99)
    ch = tf.table_changes(spark, dv_table, 1, v2)
    rows = ch.collect()
    assert {r._change_type for r in rows} == {"delete"}
    assert sorted(r.doc_id for r in rows) == list(range(95, 100))
    v3 = tf.optimize_table(spark, dv_table, target_file_rows=100)
    assert tf.table_changes(spark, dv_table, v2, v3).count() == 0


def test_merge_dv_matches_cow_merge_without_rewrites(spark, tmp_path):
    """merge_into_dv produces the SAME live relation as copy-on-write
    merge_into, while carrying every pre-existing data file by
    reference (tombstones + appended update files only)."""
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).repartitionByRange(4, "doc_id")
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    tf.create_table(spark, df, cow, stats_cols=["doc_id"])
    tf.create_table(spark, df, mor, stats_cols=["doc_id"])
    upd = spark.createDataFrame(
        [(3, "updated"), (55, "also"), (999, "new")],
        "doc_id long, text string",
    )
    tf.merge_into(spark, upd, cow, key="doc_id")
    v2 = tf.merge_into_dv(spark, upd, mor, key="doc_id")
    a = sorted(map(tuple, tf.read(spark, cow).collect()))
    b = sorted(map(tuple, tf.read(spark, mor).collect()))
    assert a == b and len(b) == 101
    head = tf._load_manifest(mor, v2)
    v1_paths = {e["path"] for e in tf._load_manifest(mor, 1)["files"]}
    # every original file carried by reference; only new files added
    assert v1_paths <= {e["path"] for e in head["files"]}
    assert sum(e["rows"] for e in tf._dv_entries(head)) == 2  # 3, 55
    # repeated MoR merge on the same key: no double-tombstoning, the
    # previously-appended update row is tombstoned instead
    upd2 = spark.createDataFrame(
        [(3, "updated-again")], "doc_id long, text string")
    v3 = tf.merge_into_dv(spark, upd2, mor, key="doc_id")
    cur = tf.read(spark, mor)
    assert cur.count() == 101
    assert cur.where("doc_id = 3").first().text == "updated-again"
    # OPTIMIZE materializes; relation unchanged
    tf.optimize_table(spark, mor, target_file_rows=64)
    assert sorted(map(tuple, tf.read(spark, mor).collect()))[0:0] == []
    assert tf.read(spark, mor).count() == 101
    assert tf._dv_entries(tf._load_manifest(mor, v3 + 1)) == []


def test_table_changes_mor_merge_matches_cow_change_feed(spark, tmp_path):
    """CDF semantics must not depend on the write mode (round-8 advisor
    finding): a merge-on-read MERGE (DV tombstone + re-appended key)
    must produce the SAME change feed as the identical copy-on-write
    MERGE — update_preimage/update_postimage for updated keys, insert
    for new keys — not a spurious delete+insert pair."""
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).repartitionByRange(4, "doc_id")
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    tf.create_table(spark, df, cow, stats_cols=["doc_id"])
    tf.create_table(spark, df, mor, stats_cols=["doc_id"])
    upd = spark.createDataFrame(
        [(3, "updated"), (55, "also"), (999, "new")],
        "doc_id long, text string",
    )
    vc = tf.merge_into(spark, upd, cow, key="doc_id")
    vm = tf.merge_into_dv(spark, upd, mor, key="doc_id")
    want = sorted(
        (r._change_type, r.doc_id, r.text)
        for r in tf.table_changes(spark, cow, 1, vc, key="doc_id")
        .collect()
    )
    got = sorted(
        (r._change_type, r.doc_id, r.text)
        for r in tf.table_changes(spark, mor, 1, vm, key="doc_id")
        .collect()
    )
    assert got == want
    assert ("update_preimage", 3, "t3") in got
    assert ("update_postimage", 3, "updated") in got
    assert ("insert", 999, "new") in got
    assert not any(ct == "delete" for ct, _, _ in got)

    # a MoR merge that re-appends IDENTICAL content is a pure rewrite:
    # zero logical changes, in key mode and full-row mode alike
    same = spark.createDataFrame(
        [(7, "t7")], "doc_id long, text string")
    v3 = tf.merge_into_dv(spark, same, mor, key="doc_id")
    assert tf.table_changes(spark, mor, vm, v3, key="doc_id").count() == 0
    assert tf.table_changes(spark, mor, vm, v3).count() == 0

    # DV-only deletes (no re-insert of the key) still surface as
    # plain deletes in key mode
    v4 = tf.delete_where_dv(spark, mor, "doc_id", 90, 92)
    ch = tf.table_changes(spark, mor, v3, v4, key="doc_id")
    assert {(r._change_type, r.doc_id) for r in ch.collect()} == {
        ("delete", 90), ("delete", 91), ("delete", 92)}


def test_table_changes_multi_insert_per_key_pairs_per_row(spark,
                                                          tmp_path):
    """Round-9 ADVICE item: a span with ONE tombstoned row of a key
    and N>1 re-inserted rows of that key must feed the CDF as 1
    update pair + (N-1) inserts (Delta's per-ROW update semantics),
    not an asymmetric 1-preimage/N-postimage set — and the feed must
    stay write-mode identical between MoR (DV tombstone + appends)
    and CoW (file-rewrite delete + appends)."""
    df = spark.range(0, 40).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).repartitionByRange(2, "doc_id")
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    tf.create_table(spark, df, cow, stats_cols=["doc_id"])
    tf.create_table(spark, df, mor, stats_cols=["doc_id"])

    # one key (7): tombstone its row, then re-insert TWO rows of it
    dup = spark.createDataFrame(
        [(7, "seven-a"), (7, "seven-b")], "doc_id long, text string")
    tf.delete_where(spark, cow, "doc_id", 7, 7)
    vc = tf.append(spark, dup, cow)
    tf.delete_where_dv(spark, mor, "doc_id", 7, 7)
    vm = tf.append(spark, dup, mor)

    def feed(root, v):
        return sorted(
            (r._change_type, r.doc_id, r.text)
            for r in tf.table_changes(spark, root, 1, v, key="doc_id")
            .collect()
        )

    got_cow, got_mor = feed(cow, vc), feed(mor, vm)
    assert got_mor == got_cow
    types = [ct for ct, _, _ in got_cow]
    assert types.count("update_preimage") == 1
    assert types.count("update_postimage") == 1
    assert types.count("insert") == 1
    assert types.count("delete") == 0
    assert ("update_preimage", 7, "t7") in got_cow
    # the paired postimage and the surplus insert partition the two
    # new rows (rank pairing is content-ordered and deterministic)
    new_rows = {(ct, t) for ct, d, t in got_cow if d == 7
                and ct in ("update_postimage", "insert")}
    assert new_rows == {("update_postimage", "seven-a"),
                        ("insert", "seven-b")}

    # shrinking key: 2 old rows -> 1 new row is 1 update + 1 delete
    shrink_src = spark.createDataFrame(
        [(7, "seven-final")], "doc_id long, text string")
    tf.delete_where(spark, cow, "doc_id", 7, 7)
    vc2 = tf.append(spark, shrink_src, cow)
    ch2 = sorted(
        (r._change_type, r.doc_id, r.text)
        for r in tf.table_changes(spark, cow, vc, vc2, key="doc_id")
        .collect()
    )
    t2 = [ct for ct, _, _ in ch2]
    assert t2.count("update_preimage") == 1
    assert t2.count("update_postimage") == 1
    assert t2.count("delete") == 1
    assert t2.count("insert") == 0


def test_scan_keys_prunes_on_clustered_table(spark, tmp_path):
    """scan_keys (round-9): manifest IN-list pruning on a clustered
    column — keys inside one file's range read just that file; keys
    outside every range read nothing; the unpruned rows are a superset
    of exact matches (stats pruning is I/O, not the predicate)."""
    root = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr(
        "id AS k", "concat('v', id) AS v"
    ).repartitionByRange(8, "k")
    tf.create_table(spark, df, root, stats_cols=["k"])

    got, files_read, files_total = tf.scan_keys(spark, root, "k", [3, 7])
    assert files_total == 8 and files_read == 1
    assert {r.k for r in got.where("k in (3, 7)").collect()} == {3, 7}

    # keys beyond every file range: zero files, empty relation
    got0, fr0, ft0 = tf.scan_keys(spark, root, "k", [5000])
    assert fr0 == 0 and ft0 == 8 and got0.count() == 0

    # empty key set: zero files
    gote, fre, _ = tf.scan_keys(spark, root, "k", [])
    assert fre == 0 and gote.count() == 0

    # keys spanning several ranges read only the covering files
    _, frm, _ = tf.scan_keys(spark, root, "k", [10, 990])
    assert frm == 2


def test_fingerprint_dropped_by_mutating_kept_by_maintenance(
    spark, tmp_path,
):
    """Round-10 (r09 advisory): artifact_fingerprint must survive
    ROW-PRESERVING maintenance (optimize) but be DROPPED by any
    row-mutating commit (append/merge/delete) — a mutated artifact
    table no longer equals the builder's output and has to read as
    stale so artifacts._ensure_table rebuilds instead of serving it."""
    root = str(tmp_path / "t")
    df = spark.range(0, 50).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).repartition(2, "doc_id")
    tf.create_table(spark, df, root, stats_cols=["doc_id"],
                    extra_meta={"artifact_fingerprint": "fp0"})

    def head():
        return tf._load_manifest(root, tf._versions(root)[-1])

    tf.optimize_table(spark, root, target_file_rows=25)
    assert head().get("artifact_fingerprint") == "fp0"

    tf.append(spark, spark.range(50, 60).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"), root)
    assert "artifact_fingerprint" not in head()

    # rebuild the fingerprint via the store's replace path, then check
    # each other mutating commit type drops it again
    tf.replace(spark, df, root,
               extra_meta={"artifact_fingerprint": "fp1"})
    assert head().get("artifact_fingerprint") == "fp1"
    tf.merge_into(spark, spark.createDataFrame(
        [(3, "u")], "doc_id long, text string"), root, "doc_id")
    assert "artifact_fingerprint" not in head()

    tf.replace(spark, df, root,
               extra_meta={"artifact_fingerprint": "fp2"})
    tf.delete_where(spark, root, "doc_id", 0, 5)
    assert "artifact_fingerprint" not in head()

    tf.replace(spark, df, root,
               extra_meta={"artifact_fingerprint": "fp3"})
    tf.delete_where_dv(spark, root, "doc_id", 0, 5)
    assert "artifact_fingerprint" not in head()


def test_scan_degrades_to_full_read_without_stats(spark, tmp_path):
    """Round-10 (r09 advisory): scan/scan_keys on a column with NO
    recorded stats (older commits under a different stats_cols set)
    must read every such file — pruning degrades to correctness, the
    public API never raises KeyError."""
    root = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr(
        "id AS k", "id % 10 AS v"
    ).repartitionByRange(4, "k")
    tf.create_table(spark, df, root, stats_cols=["k"])

    # probe a column that has no stats: all files conservatively read
    got, fr, ft = tf.scan(spark, root, "v", 3, 3)
    assert fr == ft == 4
    assert got.count() == 10  # the row filter still applies

    gk, frk, ftk = tf.scan_keys(spark, root, "v", [3])
    assert frk == ftk == 4
    assert gk.where("v = 3").count() == 10

    # and delete_where on the stat-less column still deletes correctly
    tf.delete_where(spark, root, "v", 3, 3)
    assert tf.read(spark, root).where("v = 3").count() == 0
    assert tf.read(spark, root).count() == 90


def test_table_changes_on_key_only_table(spark, tmp_path):
    """Round-10 (r09 advisory): a table whose ONLY column is the key
    has no non-key columns to rank _pair_update_images by; the CDF
    must fall back instead of raising on an empty orderBy."""
    root = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id AS k")
    tf.create_table(spark, df, root, stats_cols=["k"])
    tf.merge_into(spark, spark.range(5, 15).selectExpr("id AS k"),
                  root, "k")
    ch = tf.table_changes(spark, root, 1, 2, key="k")
    by_type = {r["_change_type"]: r["n"] for r in ch.groupBy(
        "_change_type").count().withColumnRenamed(
        "count", "n").collect()}
    # keys 10-14 are inserts; keys 5-9 were rewritten identical (merge
    # rewrote their file) and must NOT surface as changes
    assert by_type.get("insert") == 5
    assert "delete" not in by_type


# ------------------------------------------------- per-file blooms


@pytest.fixture()
def bloom_table(spark, tmp_path):
    root = str(tmp_path / "btbl")
    df = spark.range(0, 400).selectExpr(
        "id AS doc_id", "md5(cast(id % 50 AS string)) AS bh"
    ).repartition(4, "doc_id")
    tf.create_table(
        spark, df, root, stats_cols=["doc_id", "bh"],
        bloom_cols=["doc_id", "bh"],
    )
    return root


def test_bloom_positions_match_spark_md5(spark):
    # the cross-engine contract: Python bloom_positions must equal
    # the 16-bit slices of Spark's md5(cast(col as string)) — over
    # EVERY type create_table admits as a bloom column
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(7, 7, 7, 7, "s-7"), (123, 123, 12345, 123456789, "x y")],
        "kb tinyint, ks smallint, ki int, kl long, kstr string",
    )
    for c in df.columns:
        rows = df.select(
            F.col(c).alias("k"),
            F.md5(F.col(c).cast("string")).alias("h"),
        ).collect()
        for r in rows:
            expect = [int(r["h"][4 * j:4 * j + 4], 16) for j in range(8)]
            assert tf.bloom_positions(r["k"]) == expect, c


def test_create_table_rejects_unsafe_bloom_types(spark, tmp_path):
    # boolean/double/timestamp stringify differently in Python vs
    # Spark ('True' vs 'true', '1e-07' vs '1.0E-7') — a bloom on such
    # a column would false-negative every probe, so create_table must
    # refuse it instead of silently corrupting scan_membership
    df = spark.createDataFrame(
        [(1, True, 1e-7)], "doc_id long, flag boolean, score double"
    )
    for bad in ("flag", "score"):
        with pytest.raises(ValueError, match="bloom_cols"):
            tf.create_table(
                spark, df, str(tmp_path / f"t_{bad}"),
                stats_cols=["doc_id"], bloom_cols=[bad],
            )
    # integral + string columns stay accepted
    tf.create_table(
        spark, df.selectExpr("doc_id", "cast(doc_id as string) AS s"),
        str(tmp_path / "t_ok"), stats_cols=["doc_id"],
        bloom_cols=["doc_id", "s"],
    )


def test_scan_keys_bloom_prunes_when_stats_missing(spark, tmp_path):
    # a column outside stats_cols but inside bloom_cols: scan_keys
    # used to read every file (missing stats returned True before the
    # bloom check); it must fall through to the bloom like
    # scan_membership does
    root = str(tmp_path / "nostats")
    df = spark.range(0, 200).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS bh"
    ).repartition(4, "doc_id")
    tf.create_table(
        spark, df, root, stats_cols=["doc_id"], bloom_cols=["bh"],
    )
    import hashlib

    absent = [hashlib.md5(f"zz{i}".encode()).hexdigest() for i in range(20)]
    _, fr, ft = tf.scan_keys(spark, root, "bh", absent)
    assert ft == 4 and fr == 0
    present = [hashlib.md5(b"42").hexdigest()]
    got, fr, _ = tf.scan_keys(spark, root, "bh", present)
    assert fr >= 1
    assert got.where("doc_id = 42").count() == 1


def test_scan_membership_prunes_absent_keys(spark, bloom_table):
    # present key: at least the holding file is read, row comes back
    df, fr, ft = tf.scan_membership(spark, bloom_table, "doc_id", [123])
    assert ft == 4 and fr >= 1
    assert df.where("doc_id = 123").count() == 1
    # absent keys: every bloom misses -> zero files read
    df, fr, _ = tf.scan_membership(
        spark, bloom_table, "doc_id", [10_000_001, 10_000_002]
    )
    assert fr == 0 and df.count() == 0
    # string column probes work the same way
    import hashlib

    present = hashlib.md5(b"7").hexdigest()
    _, fr, _ = tf.scan_membership(spark, bloom_table, "bh", [present])
    assert fr >= 1
    _, fr, _ = tf.scan_membership(spark, bloom_table, "bh", ["no-such"])
    assert fr == 0


def test_scan_membership_degrades_without_blooms(spark, table):
    # a table created WITHOUT bloom_cols must read range-overlapping
    # files (conservative), never skip
    df, fr, ft = tf.scan_membership(spark, table, "doc_id", [3])
    assert fr >= 1
    assert df.where("doc_id = 3").count() == 1


def test_scan_keys_uses_blooms_when_ranges_are_wide(spark, tmp_path):
    # files clustered on doc_id -> every file's bh [min,max] spans the
    # hex space, so a multi-key bh probe RANGE-hits all files; the
    # bloom must still prune files not holding any probed bucket
    root = str(tmp_path / "wtbl")
    df = spark.range(0, 400).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS bh"
    )
    tf.create_table(
        spark, df.repartitionByRange(4, "doc_id"), root,
        stats_cols=["doc_id", "bh"], bloom_cols=["bh"],
    )
    import hashlib

    absent = [hashlib.md5(f"x{i}".encode()).hexdigest() for i in range(50)]
    _, fr, ft = tf.scan_keys(spark, root, "bh", absent)
    assert ft == 4 and fr == 0
    present = [hashlib.md5(b"42").hexdigest()]
    got, fr, _ = tf.scan_keys(spark, root, "bh", present)
    assert fr == 1
    assert got.where("doc_id = 42").count() == 1


def test_blooms_maintained_across_append_merge_optimize(spark, bloom_table):
    more = spark.range(1000, 1050).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS bh"
    )
    tf.append(spark, more, bloom_table)
    _, fr, _ = tf.scan_membership(spark, bloom_table, "doc_id", [1025])
    assert fr >= 1
    # merge rewrites keep blooms on rewritten + new files
    upd = spark.createDataFrame(
        [(1025, "zz"), (7777, "new")], "doc_id long, bh string"
    )
    tf.merge_into(spark, upd, bloom_table, key="doc_id")
    head = tf._load_manifest(bloom_table, tf._versions(bloom_table)[-1])
    assert all("blooms" in e for e in head["files"])
    _, fr, _ = tf.scan_membership(spark, bloom_table, "doc_id", [7777])
    assert fr >= 1
    # optimize re-clusters and recomputes blooms
    tf.optimize_table(spark, bloom_table, 200, cluster_by="bh")
    head = tf._load_manifest(bloom_table, tf._versions(bloom_table)[-1])
    assert all("blooms" in e for e in head["files"])
    got, fr, _ = tf.scan_membership(spark, bloom_table, "doc_id", [7777])
    assert got.where("doc_id = 7777").count() == 1
    _, fr, _ = tf.scan_membership(spark, bloom_table, "doc_id", [424242])
    assert fr == 0


def test_bloom_null_handling(spark, tmp_path):
    root = str(tmp_path / "ntbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "doc_id long, bh string"
    ).coalesce(1)
    tf.create_table(
        spark, df, root, stats_cols=["doc_id"], bloom_cols=["bh"],
    )
    # a NULL probe must hit the file that holds a NULL
    _, fr, _ = tf.scan_membership(spark, root, "bh", [None])
    assert fr == 1
    # and a NULL probe against a null-free file misses
    root2 = str(tmp_path / "ntbl2")
    tf.create_table(
        spark,
        spark.createDataFrame([(1, "a")], "doc_id long, bh string"),
        root2, stats_cols=["doc_id"], bloom_cols=["bh"],
    )
    _, fr, _ = tf.scan_membership(spark, root2, "bh", [None])
    assert fr == 0


def test_bloom_sidecar_layout_and_manifest_size(spark, bloom_table):
    """Round 11 (puffin swap): bitmaps live in one per-commit sidecar
    JSON next to the data files; the manifest entry keeps only
    has_null + the sidecar ref + content hash. At ~10k files the old
    inline form was 8 KiB × files × cols of manifest — the manifest
    must stay KB-sized regardless of file count."""
    import os

    head = tf._load_manifest(bloom_table, tf._versions(bloom_table)[-1])
    refs = set()
    for e in head["files"]:
        for c, b in e["blooms"].items():
            assert "b64" not in b, "bitmap must not be inline"
            assert "ref" in b and "sha256" in b
            refs.add(b["ref"])
            assert os.path.exists(os.path.join(bloom_table, b["ref"]))
    assert refs  # at least one sidecar
    # 4 files x 2 bloom cols inline would be ~87 KiB of base64; the
    # manifest with refs stays tiny
    msize = os.path.getsize(
        tf._manifest_path(bloom_table, head["version"]))
    assert msize < 8_000, msize


def test_bloom_sidecar_corruption_refuses_to_prune(spark, tmp_path):
    import json
    import os

    root = str(tmp_path / "ctbl")
    df = spark.range(0, 50).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS bh")
    tf.create_table(spark, df.coalesce(1), root,
                    stats_cols=["doc_id"], bloom_cols=["bh"])
    head = tf._load_manifest(root, tf._versions(root)[-1])
    ref = head["files"][0]["blooms"]["bh"]["ref"]
    side_path = os.path.join(root, ref)
    with open(side_path) as f:
        side = json.load(f)
    # flip the bitmap: same shape, different bytes
    k = next(iter(side))
    side[k]["bh"]["b64"] = "A" * len(side[k]["bh"]["b64"])
    with open(side_path, "w") as f:
        json.dump(side, f)
    tf._SIDECAR_CACHE.clear()
    with pytest.raises(ValueError, match="sidecar"):
        tf.scan_membership(spark, root, "bh", ["zz"])


def test_vacuum_keeps_live_bloom_sidecars_removes_orphaned(
    spark, bloom_table
):
    """expire_snapshots must treat sidecars referenced by retained
    snapshots as live content (pruning still works after vacuum) and
    reclaim the ones only expired snapshots referenced."""
    import glob
    import os

    more = spark.range(1000, 1100).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS bh")
    tf.append(spark, more, bloom_table)
    tf.optimize_table(spark, bloom_table, 200, cluster_by="bh")
    sidecars_before = set(glob.glob(
        os.path.join(bloom_table, "data", "*", "_blooms.json")))
    assert len(sidecars_before) >= 3  # create + append + optimize
    out = tf.expire_snapshots(bloom_table, keep_last=1)
    assert out["removed_files"] > 0
    sidecars_after = set(glob.glob(
        os.path.join(bloom_table, "data", "*", "_blooms.json")))
    # only the optimize commit's files (and sidecar) are still live
    assert len(sidecars_after) < len(sidecars_before)
    head = tf._load_manifest(bloom_table, tf._versions(bloom_table)[-1])
    live_refs = {
        os.path.normpath(os.path.join(bloom_table, b["ref"]))
        for e in head["files"] for b in e["blooms"].values()
    }
    assert live_refs <= {os.path.normpath(p) for p in sidecars_after}
    # pruning still functions on the survivor
    tf._SIDECAR_CACHE.clear()
    _, fr, _ = tf.scan_membership(
        spark, bloom_table, "doc_id", [424242])
    assert fr == 0
    got, fr, _ = tf.scan_membership(
        spark, bloom_table, "doc_id", [1050])
    assert fr >= 1 and got.where("doc_id = 1050").count() == 1


def test_sidecar_cache_rechecks_sha_on_path_reuse(spark, tmp_path):
    """A cache hit must be honored only when the manifest ref's sha256
    matches the cached entry's verified sha: a sidecar path rewritten
    with different bytes (stage-retry reusing data/stage-{s}-vN/) must
    be re-read and re-verified, never served stale from the cache."""
    import hashlib
    import json
    import os

    root = str(tmp_path / "shatbl")
    df = spark.range(0, 50).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS bh")
    tf.create_table(spark, df.coalesce(1), root,
                    stats_cols=["doc_id"], bloom_cols=["bh"])
    head = tf._load_manifest(root, tf._versions(root)[-1])
    ref = dict(head["files"][0]["blooms"]["bh"])
    side_path = os.path.normpath(os.path.join(root, ref["ref"]))

    tf._SIDECAR_CACHE.clear()
    first = tf._load_bloom_sidecar(root, ref)
    assert side_path in tf._SIDECAR_CACHE

    # rewrite the SAME path with different (valid) bytes, as a stage
    # retry that reuses the stage dir would
    with open(side_path) as f:
        side = json.load(f)
    k = next(iter(side))
    side[k]["bh"]["b64"] = "A" * len(side[k]["bh"]["b64"])
    raw = json.dumps(side).encode()
    with open(side_path, "wb") as f:
        f.write(raw)
    new_ref = {"ref": ref["ref"], "sha256": hashlib.sha256(raw).hexdigest()}

    # a ref carrying the NEW sha must get the new bytes (cache miss +
    # re-verify), not the stale cached dict
    fresh = tf._load_bloom_sidecar(root, new_ref)
    assert fresh != first
    assert fresh[k]["bh"]["b64"] == "A" * len(side[k]["bh"]["b64"])
    # and a ref still carrying the OLD sha now fails verification
    # loudly instead of silently serving either version from cache
    tf._SIDECAR_CACHE.clear()
    with pytest.raises(ValueError, match="sidecar"):
        tf._load_bloom_sidecar(root, ref)


def test_vacuum_keeps_pending_stage_files_live(spark, table):
    """expire_snapshots must treat pending _staged manifests as
    liveness roots: a vacuum run while a stage is pending must not
    delete the staged data files (or the base files the candidate
    still references) — the later publish must still be readable."""
    staged = spark.createDataFrame(
        [(800, "pending row", 1)], "doc_id long, text string, grp long"
    ).coalesce(1)  # no empty part files: removed_files==0 stays strict
    tf.stage_append(spark, staged, table, stage="slowaudit")
    # vacuum while the stage is pending: base v1 is the head, so only
    # orphans could go — but the staged files are NOT orphans anymore
    out = tf.expire_snapshots(table, keep_last=1)
    assert out["removed_files"] == 0
    # audit + publish still function after the vacuum
    assert tf.read_staged(spark, table, "slowaudit").count() == 101
    tf.publish_stage(table, "slowaudit")
    cur = tf.read(spark, table)
    assert cur.count() == 101
    assert cur.where("doc_id = 800").count() == 1


def test_bloom_popcount_exact_prunability_on_key_repeating_table(
    spark, tmp_path,
):
    """Round-13 sidecar-POPCOUNT fix: on a key-REPEATING table (the
    LSH index shape: few distinct keys, many rows each) the analytic
    row-count density estimate overshoots and skips the bloom, while
    the manifest's measured nbits keeps it engaged — pruning decided
    from measured bits, not modeled rows."""
    root = str(tmp_path / "reptbl")
    # 20_000 rows but only 40 distinct keys per file: estimated
    # density from rows ~0.91 (unprunable for any probe); measured
    # nbits <= 40*8 = 320 bits -> density ~0.005 (sharp)
    df = spark.range(0, 40_000).selectExpr(
        "id AS doc_id",
        "concat('k', cast(pmod(id, 80) AS string)) AS bh",
    ).repartitionByRange(2, "bh")
    tf.create_table(spark, df, root,
                    stats_cols=["doc_id"], bloom_cols=["bh"])
    head = tf._load_manifest(root, tf._versions(root)[-1])
    for e in head["files"]:
        b = e["blooms"]["bh"]
        assert 0 < b["nbits"] <= 80 * tf._BLOOM_K
        # measured: prunable even for a 100-key probe
        assert tf._bloom_prunable(e, "bh", 100)
        # the pre-r13 estimate (rows-based) refuses the same probe —
        # drop nbits to prove the fallback is what used to happen
        no_nbits = dict(e, blooms={"bh": {
            k: v for k, v in b.items() if k != "nbits"
        }})
        assert not tf._bloom_prunable(no_nbits, "bh", 100)
    # and the engaged gate actually prunes: absent keys read 0 files
    _, fr, ft = tf.scan_keys(
        spark, root, "bh", [f"x{i}" for i in range(100)]
    )
    assert ft == 2 and fr == 0
    # present key reads only its file(s), rows exact
    got, fr, _ = tf.scan_keys(spark, root, "bh", ["k7"])
    assert 1 <= fr <= 2
    assert got.where("bh = 'k7'").count() == 500


def test_stage_json_write_is_atomic_and_exclusive(spark, table):
    more = spark.range(100, 120).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"
    )
    tf.stage_append(spark, more, table, "s1")
    # no tmp leftovers next to the stage manifest
    sdir = os.path.join(table, tf._STAGE_DIR)
    assert sorted(os.listdir(sdir)) == ["s1.json"]
    # the exactly-one-winner contract survives the tmp+link rewrite:
    # re-staging the same tag from a NEW base (different data dir, so
    # only the manifest link can collide) raises instead of clobbering
    # the in-flight stage's manifest
    tf.append(spark, more.limit(1), table)
    with pytest.raises(FileExistsError):
        tf.stage_append(spark, more, table, "s1")
    assert sorted(os.listdir(sdir)) == ["s1.json"]  # tmp cleaned up
    import json as _json
    with open(tf._stage_path(table, "s1")) as f:
        assert _json.load(f)["base_version"] == 1  # original intact
    with pytest.raises(RuntimeError, match="re-stage"):
        tf.publish_stage(table, "s1")  # base drifted (the append)
    tf.discard_stage(table, "s1")


def test_vacuum_tolerates_corrupt_stage_json(spark, table):
    """Round-13 advice: a corrupt _staged manifest must not crash the
    vacuum, and the vacuum must conservatively keep that stage's data
    dir family alive (prefix liveness) instead of reclaiming files a
    repair might still reference."""
    more = spark.range(100, 130).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "id % 7 AS grp"
    )
    tf.stage_append(spark, more, table, "hurt")
    sp = tf._stage_path(table, "hurt")
    raw = open(sp).read()
    with open(sp, "w") as f:
        f.write(raw[: len(raw) // 2])  # truncated mid-object
    stage_dirs = [
        d for d in os.listdir(os.path.join(table, "data"))
        if d.startswith("stage-hurt-")
    ]
    assert stage_dirs
    n_stage_files = sum(
        len(files) for d in stage_dirs
        for _, _, files in os.walk(os.path.join(table, "data", d))
    )
    tf.append(spark, more.limit(1), table)  # give vacuum work to keep
    res = tf.expire_snapshots(table, keep_last=1)
    assert res["kept_versions"]
    still = sum(
        len(files) for d in stage_dirs
        for _, _, files in os.walk(os.path.join(table, "data", d))
    )
    assert still == n_stage_files  # nothing under the stage reclaimed
    # repair: restore the manifest, the stage publishes or discards
    with open(sp, "w") as f:
        f.write(raw)
    assert tf.discard_stage(table, "hurt") >= 1
