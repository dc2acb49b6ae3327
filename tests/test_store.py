"""Store layer: MERGE-upsert, append-only history, gaps, policies,
snapshots (SURVEY §2.9 M1-M5, §2.11 D4)."""

from __future__ import annotations

import datetime as dt
import decimal

import pyspark.sql.functions as F
import pytest

from agrobr_spark.store import (
    HistoryStore,
    IndicadoresStore,
    business_day_gaps,
    next_expiry,
    snapshot_filter,
    with_snapshot,
)
from agrobr_spark.store.indicadores import SCHEMA


def _row(produto, praca, data, valor, fonte="cepea", ts="2024-01-01 12:00:00"):
    return (
        produto,
        praca,
        dt.date.fromisoformat(data),
        fonte,
        decimal.Decimal(str(valor)),
        None,
        "BRL/sc60kg",
        dt.datetime.fromisoformat(ts),
    )


ORDER = ["produto", "praca", "data", "fonte", "valor", "variacao", "unidade", "collected_at"]


def _mk(spark, rows):
    return spark.createDataFrame([tuple(r[ORDER.index(c)] for c in SCHEMA.fieldNames()) for r in rows], SCHEMA)


def test_indicadores_upsert_lww_null_praca(spark, tmp_path):
    store = IndicadoresStore(spark, str(tmp_path / "ind"))
    base = _mk(
        spark,
        [
            _row("soja", "Paranagua", "2024-01-02", 120),
            _row("soja", None, "2024-01-02", 119),
            _row("milho", "Campinas", "2024-01-02", 60),
        ],
    )
    assert store.upsert(base) == 3
    # update soja/Paranagua + the NULL-praca row; insert a new date
    upd = _mk(
        spark,
        [
            _row("soja", "Paranagua", "2024-01-02", 121, ts="2024-01-02 12:00:00"),
            _row("soja", None, "2024-01-02", 118.5, ts="2024-01-02 12:00:00"),
            _row("soja", "Paranagua", "2024-01-03", 122, ts="2024-01-02 12:00:00"),
        ],
    )
    assert store.upsert(upd) == 3
    rows = {
        (r["produto"], r["praca"], r["data"].isoformat()): float(r["valor"])
        for r in store.table.read().collect()
    }
    assert len(rows) == 4  # 3 base keys (2 updated) + 1 insert
    assert rows[("soja", "Paranagua", "2024-01-02")] == 121.0
    assert rows[("soja", None, "2024-01-02")] == 118.5  # NULL-safe key matched
    assert rows[("milho", "Campinas", "2024-01-02")] == 60.0

    # untouched partition files not rewritten on a soja-only merge
    q = store.query("soja", inicio="2024-01-03").collect()
    assert [float(r["valor"]) for r in q] == [122.0]


def test_history_append_only_dedup(spark, tmp_path):
    h = HistoryStore(spark, str(tmp_path / "hist"))
    t0 = dt.datetime(2024, 1, 1, 8)
    batch = spark.createDataFrame(
        [("k1", dt.date(2024, 1, 1), t0, bytearray(b"a"))],
        "key string, data_date date, collected_at timestamp, payload binary",
    )
    assert h.append(batch) == 1
    assert h.append(batch) == 0  # silently exists
    batch2 = spark.createDataFrame(
        [("k1", dt.date(2024, 1, 1), t0 + dt.timedelta(hours=1), bytearray(b"b"))],
        "key string, data_date date, collected_at timestamp, payload binary",
    )
    assert h.append(batch2) == 1
    assert h.read().count() == 2


def test_business_day_gaps(spark):
    have = spark.createDataFrame(
        [(dt.date(2024, 1, 2),), (dt.date(2024, 1, 4),)], "data date"
    )
    gaps = [
        r["data"].isoformat()
        for r in business_day_gaps(have, dt.date(2024, 1, 1), dt.date(2024, 1, 8)).collect()
    ]
    # 1/1 Mon, 1/3 Wed, 1/5 Fri, 1/8 Mon missing; 1/6-1/7 weekend excluded
    assert gaps == ["2024-01-01", "2024-01-03", "2024-01-05", "2024-01-08"]


def test_next_expiry_publication_time():
    before = dt.datetime(2024, 3, 1, 12, 0, tzinfo=dt.timezone.utc)  # 09:00 SP
    after = dt.datetime(2024, 3, 1, 22, 0, tzinfo=dt.timezone.utc)  # 19:00 SP
    e1 = next_expiry("cepea", before)
    e2 = next_expiry("cepea", after)
    assert e1.astimezone(dt.timezone.utc).hour == 21  # 18:00 SP == 21:00 UTC
    assert e1.date() == dt.date(2024, 3, 1)
    assert e2.date() == dt.date(2024, 3, 2)
    # plain-TTL source
    assert next_expiry("ibge", before) == before + dt.timedelta(days=7)


def test_snapshot_filter(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, d),) for d in (1, 5, 9)], "data date"
    )
    assert snapshot_filter(df).count() == 3  # no pin active
    with with_snapshot(dt.date(2024, 1, 5)):
        assert snapshot_filter(df).count() == 2
    assert snapshot_filter(df).count() == 3  # pin released


class TestMigrations:
    """M6 versioned schema migrations (ref: agrobr/cache/migrations.py)."""

    def _store(self, spark, tmp_path):
        from agrobr_spark.store.table import ParquetStore

        return ParquetStore(
            spark, str(tmp_path / "tbl"), primary_key=("k",)
        )

    def test_apply_pending_and_idempotent(self, spark, tmp_path):
        from agrobr_spark.store.migrations import (
            add_column,
            current_version,
            migrate,
            widen_column,
        )

        store = self._store(spark, tmp_path)
        store.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
        migs = [
            (1, "add fonte", add_column("fonte", "string")),
            (2, "widen v", widen_column("v", "double")),
        ]
        assert migrate(store, migs) == 2
        df = store.read()
        assert dict(df.dtypes) == {"k": "int", "v": "double", "fonte": "string"}
        assert current_version(store) == 2
        # idempotent: second run is a no-op at version 2
        assert migrate(store, migs) == 2

    def test_partial_catchup(self, spark, tmp_path):
        from agrobr_spark.store.migrations import add_column, migrate

        store = self._store(spark, tmp_path)
        store.overwrite(spark.createDataFrame([(1,)], "k int"))
        assert migrate(store, [(1, "a", add_column("a", "int"))]) == 1
        out = migrate(
            store,
            [
                (1, "a", add_column("a", "int")),
                (2, "b", add_column("b", "int")),
            ],
        )
        assert out == 2
        assert set(store.read().columns) == {"k", "a", "b"}


def test_merge_upsert_partition_cardinality_guard(spark, tmp_path, monkeypatch):
    from agrobr_spark.store import table as table_mod
    from agrobr_spark.store.table import ParquetStore

    monkeypatch.setattr(table_mod, "_MAX_PARTITIONS_PER_MERGE", 3)
    store = ParquetStore(
        spark, str(tmp_path / "t"), primary_key=("k",), partition_col="p"
    )
    small = spark.createDataFrame(
        [(i, f"p{i % 2}") for i in range(6)], "k int, p string"
    )
    assert store.merge_upsert(small) == 6  # first write, 2 partitions: fine
    wide = spark.createDataFrame(
        [(i, f"p{i}") for i in range(5)], "k int, p string"
    )
    with pytest.raises(ValueError, match="spans >3"):
        store.merge_upsert(wide)


def test_merge_upsert_extra_partitions_dedups_moved_pk(spark, tmp_path):
    """A PK row whose partition column is DERIVED FROM A MUTABLE
    attribute (the labels_by_comp secondary layout: cbalde =
    pmod(componente)) MOVES partitions when that attribute changes.
    The staged row rewrites the new partition, but the stale old copy
    lives in a partition the staging batch never names — it must join
    the dedup via ``extra_partitions`` or the PK silently duplicates;
    a partition the dedup leaves EMPTY must lose its files too
    (dynamic overwrite alone never touches it)."""
    import os

    from agrobr_spark.store.table import ParquetStore

    def rows(store):
        return sorted(
            (r["k"], r["comp"], r["p"]) for r in store.read().collect()
        )

    # control: WITHOUT extra_partitions the stale copy survives — the
    # duplicate documents why the knob exists
    s0 = ParquetStore(
        spark, str(tmp_path / "t0"), primary_key=("k",), partition_col="p"
    )
    s0.merge_upsert(
        spark.createDataFrame(
            [(1, 10, 0), (2, 20, 1)], "k int, comp int, p int"
        )
    )
    s0.merge_upsert(
        spark.createDataFrame([(1, 11, 1)], "k int, comp int, p int")
    )
    assert rows(s0) == [(1, 10, 0), (1, 11, 1), (2, 20, 1)]  # dup PK!

    # with extra_partitions: old copy deduped, PK unique again
    s1 = ParquetStore(
        spark, str(tmp_path / "t1"), primary_key=("k",), partition_col="p"
    )
    s1.merge_upsert(
        spark.createDataFrame(
            [(1, 10, 0), (2, 20, 1), (3, 30, 0)], "k int, comp int, p int"
        )
    )
    s1.merge_upsert(
        spark.createDataFrame([(1, 11, 1)], "k int, comp int, p int"),
        extra_partitions=[0],
    )
    assert rows(s1) == [(1, 11, 1), (2, 20, 1), (3, 30, 0)]

    # emptied-partition case: k=3 was p=0's LAST row; after it moves,
    # dynamic overwrite writes nothing under p=0, so the explicit
    # delete must remove the directory or the stale file resurrects it
    s1.merge_upsert(
        spark.createDataFrame([(3, 31, 1)], "k int, comp int, p int"),
        extra_partitions=[0],
    )
    assert rows(s1) == [(1, 11, 1), (2, 20, 1), (3, 31, 1)]
    assert not os.path.exists(str(tmp_path / "t1" / "p=0"))


def test_exists_via_hadoop_fs(spark, tmp_path):
    from agrobr_spark.store.table import ParquetStore

    store = ParquetStore(spark, str(tmp_path / "nowhere"), primary_key=("k",))
    assert not store.exists()
    spark.createDataFrame([(1,)], "k int").write.parquet(str(tmp_path / "t2"))
    assert ParquetStore(spark, str(tmp_path / "t2"), primary_key=("k",)).exists()


def test_staging_cleanup_via_hadoop_fs(spark, tmp_path):
    """rewrite() must remove its ._staged sibling through the Hadoop FS
    API (works beyond the local filesystem — completes the r3 exists()
    hardening for the delete path)."""
    from agrobr_spark.store.table import ParquetStore

    path = str(tmp_path / "t_rw")
    store = ParquetStore(spark, path, primary_key=("k",))
    store.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    store.rewrite(store.read().withColumnRenamed("v", "v2"))
    import os

    assert not os.path.exists(path + "._staged")
    assert store.read().columns == ["k", "v2"]


def test_fs_helpers_roundtrip(spark, tmp_path):
    """read_text/write_text/delete_path against a scheme-qualified
    (file://) path — the s3a-style pattern used for exists()."""
    from agrobr_spark.store.fs import delete_path, path_exists, read_text, write_text

    p = "file://" + str(tmp_path / "meta" / "x.json")
    assert read_text(spark, p) is None
    write_text(spark, p, '{"schema_version": 7}')
    assert read_text(spark, p) == '{"schema_version": 7}'
    assert path_exists(spark, p)
    assert delete_path(spark, p)
    assert not path_exists(spark, p)
    assert not delete_path(spark, p)  # idempotent on missing


def test_migration_meta_on_scheme_qualified_path(spark, tmp_path):
    """Migrations record/read their version sidecar through the FS
    API, so a file:// store migrates identically to a bare path."""
    from agrobr_spark.store.migrations import add_column, current_version, migrate
    from agrobr_spark.store.table import ParquetStore

    path = "file://" + str(tmp_path / "t_mig")
    store = ParquetStore(spark, path, primary_key=("k",))
    store.overwrite(spark.createDataFrame([(1,)], "k int"))
    assert current_version(store) == 0
    got = migrate(store, [(1, "add v", add_column("v", "string"))])
    assert got == 1
    assert current_version(store) == 1
    assert "v" in store.read().columns
    # idempotent re-run
    assert migrate(store, [(1, "add v", add_column("v", "string"))]) == 1


def test_compact_small_files(spark, tmp_path):
    """Compaction collapses the per-upsert file accretion to one file
    per partition without changing the data."""
    from agrobr_spark.store.table import ParquetStore, compact

    store = ParquetStore(
        spark, str(tmp_path / "t_compact"), primary_key=("k",),
        partition_col="p",
    )
    for i in range(4):
        store.merge_upsert(
            spark.createDataFrame(
                [(i * 10 + j, f"g{j % 2}") for j in range(6)], "k int, p string"
            ).repartition(3)
        )
    before = sorted(r[0] for r in store.read().select("k").collect())
    n_files = compact(store, files_per_partition=1)
    after = sorted(r[0] for r in store.read().select("k").collect())
    assert after == before
    assert n_files <= 2  # one per partition value (g0, g1)


def test_compact_partitioned_plan_is_parallel(spark, tmp_path):
    """A partitioned table's compaction rewrite shuffles on
    (partition value, PK-hash salt) — parallel across partitions —
    and never global-coalesces (the pre-r13 plan serialized the
    whole table into ``files_per_partition`` tasks). The salt bounds
    files-per-partition at N without capping task parallelism."""
    from agrobr_spark.store.table import (
        ParquetStore,
        _compacted_frame,
        compact,
    )

    store = ParquetStore(
        spark, str(tmp_path / "t_cplan"), primary_key=("k",),
        partition_col="p",
    )
    store.overwrite(
        spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(60)], "k int, p string"
        )
    )
    plan = (
        _compacted_frame(store, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(p#" in plan
    assert "Coalesce" not in plan
    # and the salt actually bounds files per partition at N=2
    n_files = compact(store, files_per_partition=2)
    assert n_files <= 6  # 3 partition values x <=2 salt groups
    got = sorted(r[0] for r in store.read().select("k").collect())
    assert got == list(range(60))


def test_rewrite_staged_swap_crash_recovery(spark, tmp_path):
    """rewrite()'s staged swap repairs every crash position at the
    next open (r13: the previous rewrite wrote the table TWICE and a
    crash during the second write lost data the staged copy held but
    no code path recovered). The stage's _SUCCESS marker is the redo
    record: torn stage -> roll back (write entry points only; a
    reader can't distinguish crash debris from a live rewrite's
    in-progress stage), committed stage -> ANY entry point rolls
    forward."""
    import os
    import shutil

    from agrobr_spark.store.table import ParquetStore

    path = str(tmp_path / "t_swap")
    store = ParquetStore(spark, path, primary_key=("k",))
    store.overwrite(spark.createDataFrame([(1,), (2,)], "k int"))
    staged = store._staged_dir()

    # crash MID-STAGE-WRITE (torn: no _SUCCESS): reads serve main and
    # leave the stage alone; the next write entry point drops it
    os.makedirs(staged)
    with open(os.path.join(staged, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn")
    assert sorted(r[0] for r in store.read().collect()) == [1, 2]
    assert os.path.isdir(staged)  # reader did NOT clean it
    store.rewrite(spark.createDataFrame([(3,)], "k int"))
    assert not os.path.exists(staged)
    assert [r[0] for r in store.read().collect()] == [3]

    # crash AFTER the stage committed, main still present: a plain
    # read rolls the rewrite forward
    spark.createDataFrame([(9,)], "k int").write.parquet(staged)
    assert [r[0] for r in store.read().collect()] == [9]
    assert not os.path.exists(staged)

    # crash mid-swap, main already deleted: exists()/read() converge
    # to the staged result
    spark.createDataFrame([(7,)], "k int").write.parquet(staged)
    shutil.rmtree(path)
    assert store.exists()
    assert [r[0] for r in store.read().collect()] == [7]
    assert not os.path.exists(staged)


def test_overwrite_resolves_pending_stage(spark, tmp_path):
    """An uncleared committed stage pending at overwrite() time must
    be resolved BEFORE the overwrite — otherwise the next read's
    roll-forward would clobber the newer overwrite with the crashed
    rewrite's older data."""
    import os

    from agrobr_spark.store.table import ParquetStore

    path = str(tmp_path / "t_swap_ow")
    store = ParquetStore(spark, path, primary_key=("k",))
    store.overwrite(spark.createDataFrame([(1,)], "k int"))
    staged = store._staged_dir()
    spark.createDataFrame([(9,)], "k int").write.parquet(staged)
    store.overwrite(spark.createDataFrame([(5,)], "k int"))
    assert not os.path.exists(staged)
    assert [r[0] for r in store.read().collect()] == [5]


def test_posting_index_build_and_query(spark, tmp_path):
    """store/posting.py (r8 verdict next #2): the bucketed posting
    index answers BM25 identically to first principles, reads only
    the query terms' buckets, and round-trips its manifest."""
    import math

    from agrobr_spark.store.posting import (
        bm25_topk_indexed,
        build_posting_index,
        query_postings,
        read_manifest,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha alpha delta"),
            (3, "epsilon zeta"),
            (4, "  "),  # blank docs are excluded, like the scan path
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    build_posting_index(docs, path, n_buckets=8)
    assert read_manifest(path)["n_buckets"] == 8

    # posting rows: (doc, term) tf with per-doc length
    rows = {
        (r["doc_id"], r["termo"]): (r["dl"], r["tf"])
        for r in query_postings(spark, path, ("alpha", "beta")).collect()
    }
    assert rows == {
        (1, "alpha"): (4, 1),
        (1, "beta"): (4, 2),
        (2, "alpha"): (3, 2),
    }

    # hand-computed BM25: N=3 docs (blank excluded), avgdl=(4+3+2)/3=3
    k1, b = 1.2, 0.75
    got = {
        r["doc_id"]: (r["n_termos"], r["pontos"])
        for r in bm25_topk_indexed(
            spark, path, ("alpha", "beta"), 10, k1, b
        ).collect()
    }

    def score(tf, dl, df, n=3, avgdl=3.0):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    exp1 = round(score(1, 4, 2) + score(2, 4, 1), 6)
    exp2 = round(score(2, 3, 2), 6)
    assert got == {1: (2, exp1), 2: (1, exp2)}


def test_posting_index_incremental_update_equals_rebuild(spark, tmp_path):
    """update_posting_index: corpus build + batch update must be
    query-identical to one rebuild over corpus ∪ batch — postings
    appended at the frozen bucket width, stats folded exactly from the
    carried (n, sum_dl)."""
    from agrobr_spark.store.posting import (
        bm25_topk_indexed,
        build_posting_index,
        update_posting_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha alpha delta"),
            (3, "epsilon zeta alpha"),
            (4, "beta beta beta epsilon"),
            (5, "gamma delta"),
        ],
        "doc_id bigint, text string",
    )
    corpus = docs.filter("doc_id <= 3")
    batch = docs.filter("doc_id > 3")
    terms = ("alpha", "beta", "epsilon")

    inc = str(tmp_path / "inc")
    build_posting_index(corpus, inc, n_buckets=8)
    update_posting_index(batch, inc)

    full = str(tmp_path / "full")
    build_posting_index(docs, full, n_buckets=8)

    def answer(path):
        return [
            tuple(r)
            for r in bm25_topk_indexed(
                spark, path, terms, 10, 1.2, 0.75
            ).collect()
        ]

    assert answer(inc) == answer(full)
    from agrobr_spark.store.posting import read_stats

    s_inc = read_stats(spark, inc).collect()[0]
    s_full = read_stats(spark, full).collect()[0]
    assert (s_inc["n"], s_inc["sum_dl"]) == (s_full["n"], s_full["sum_dl"])
    assert s_inc["avgdl"] == s_full["avgdl"]


def test_posting_index_batchid_replay_is_noop(spark, tmp_path):
    """Streaming exactly-once for the posting index: re-applying an
    epoch with the same batch_id must change neither postings nor
    stats; a NEW batch_id with the same rows double-counts (the
    documented append contract — the guard is the batch id, not row
    content)."""
    from agrobr_spark.store.posting import (
        _postings_frame,
        build_posting_index,
        read_manifest,
        read_stats,
        update_posting_index,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(3, "alpha alpha delta")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "idx")
    build_posting_index(corpus, path, n_buckets=8)

    def state():
        stats = read_stats(spark, path).collect()[0]
        rows = sorted(
            tuple(r) for r in _postings_frame(spark, path).collect()
        )
        return (stats["n"], stats["sum_dl"], rows)

    update_posting_index(batch, path, batch_id=0)
    s1 = state()
    update_posting_index(batch, path, batch_id=0)  # replayed epoch
    assert state() == s1
    assert read_manifest(path)["applied_batch_ids"] == [0]
    update_posting_index(batch, path, batch_id=1)  # new epoch: applied
    assert state()[0] == s1[0] + 1


def test_posting_index_replay_after_midwrite_crash(spark, tmp_path):
    """Crash-safety of the staged-commit protocol (r9 ADVICE): a crash
    AFTER the batch directory is written but BEFORE the manifest
    commit must leave the epoch invisible, and the replay must land it
    exactly once — the failure window where the old append-then-
    manifest sequence double-counted."""
    from agrobr_spark.store import posting as P

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(3, "alpha alpha delta")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "idx")
    P.build_posting_index(corpus, path, n_buckets=8)

    # simulated crash: the data write succeeds, the commit never runs
    orig_commit = P._commit_batch
    try:
        P._commit_batch = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("crash before manifest commit")
        )
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="crash"):
            P.update_posting_index(batch, path, batch_id=7)
    finally:
        P._commit_batch = orig_commit

    # orphan directory exists but is invisible to every reader
    import os

    assert os.path.isdir(f"{path}/batches")
    assert P.read_manifest(path)["active_batches"] == []
    assert P.read_stats(spark, path).collect()[0]["n"] == 2

    # replay of the same epoch: applied exactly once
    P.update_posting_index(batch, path, batch_id=7)
    s = P.read_stats(spark, path).collect()[0]
    assert (s["n"], s["sum_dl"]) == (3, 7)
    rows = sorted(
        (r["doc_id"], r["termo"], r["tf"])
        for r in P._postings_frame(spark, path).collect()
    )
    assert rows == [
        (1, "alpha", 1), (1, "beta", 1), (2, "alpha", 1),
        (2, "gamma", 1), (3, "alpha", 2), (3, "delta", 1),
    ]
    # and a second replay after the successful commit is a no-op
    P.update_posting_index(batch, path, batch_id=7)
    assert P.read_stats(spark, path).collect()[0]["n"] == 3


def test_posting_index_compaction(spark, tmp_path):
    """compact_posting_index (r9 VERDICT next #4): indexed query
    results are identical pre/post compaction, the posting file count
    drops, the manifest generation advances with active batches
    folded, and the exactly-once replay guard survives compaction."""
    from agrobr_spark.store.posting import (
        bm25_topk_indexed,
        build_posting_index,
        compact_posting_index,
        posting_file_count,
        read_manifest,
        read_stats,
        update_posting_index,
    )

    docs = [
        (i, f"alpha term{i % 7} beta term{i % 5} gamma") for i in range(40)
    ]
    corpus = spark.createDataFrame(
        docs[:20], "doc_id bigint, text string"
    )
    path = str(tmp_path / "idx")
    build_posting_index(corpus, path, n_buckets=8)
    for e, lo in enumerate(range(20, 40, 5)):
        update_posting_index(
            spark.createDataFrame(
                docs[lo:lo + 5], "doc_id bigint, text string"
            ),
            path,
            batch_id=e,
        )
    terms = ("alpha", "term3", "gamma")
    before = [
        tuple(r)
        for r in bm25_topk_indexed(
            spark, path, terms, 10, 1.2, 0.75
        ).collect()
    ]
    files_before = posting_file_count(spark, path)
    stats_before = tuple(read_stats(spark, path).collect()[0])

    files_after = compact_posting_index(spark, path)
    man = read_manifest(path)
    assert man["version"] == 1
    assert man["postings_dir"] == "postings_v1"
    assert man["active_batches"] == []
    assert man["applied_batch_ids"] == [0, 1, 2, 3]
    assert files_after < files_before
    after = [
        tuple(r)
        for r in bm25_topk_indexed(
            spark, path, terms, 10, 1.2, 0.75
        ).collect()
    ]
    assert after == before
    assert tuple(read_stats(spark, path).collect()[0]) == stats_before
    # replay of an already-compacted epoch is still a no-op
    update_posting_index(
        spark.createDataFrame(docs[20:25], "doc_id bigint, text string"),
        path,
        batch_id=0,
    )
    assert tuple(read_stats(spark, path).collect()[0]) == stats_before


def test_positional_index_compaction(spark, tmp_path):
    """The positional (no-stats) index compacts through the same
    protocol: phrase answers identical pre/post, batch dirs folded."""
    from agrobr_spark.store.posting import (
        build_positional_index,
        compact_posting_index,
        phrase_match_indexed,
        read_manifest,
        update_positional_index,
    )

    corpus = spark.createDataFrame(
        [(1, "big red fox"), (2, "big red dog big red fox")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(3, "small cat big red fox end")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "pidx")
    build_positional_index(corpus, path, n_buckets=8)
    update_positional_index(batch, path, batch_id=0)
    phrases = ("big red fox",)

    def answer():
        return sorted(
            tuple(r)
            for r in phrase_match_indexed(spark, path, phrases).collect()
        )

    before = answer()
    assert [r[0] for r in before] == [1, 2, 3]
    compact_posting_index(spark, path)
    assert answer() == before
    assert read_manifest(path)["active_batches"] == []


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """Z-order layout: after a z-curve rewrite on (a, b), EACH file's
    min/max span in BOTH columns must be a small fraction of the
    global span (a plain sort clusters only its leading column), so
    parquet min/max stats prune selective filters on either column.
    Measured from the actual footers, not asserted from theory."""
    import glob

    import pyarrow.parquet as papq

    from agrobr_spark.store.layout import zorder_write

    n = 1 << 12
    # two independent uniform dims (decorrelated via bit-reversal)
    rows = [(i % 64, int(f"{i % 64:06b}"[::-1], 2)) for i in range(n)]
    df = spark.createDataFrame(rows, "a int, b int")

    zpath = str(tmp_path / "z")
    zorder_write(df, zpath, ["a", "b"], bits=6, n_files=16)

    spans = {"a": [], "b": []}
    for f in glob.glob(f"{zpath}/*.parquet"):
        md = papq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name in spans and st is not None:
                    spans[name].append(st.max - st.min)
    for name in ("a", "b"):
        assert spans[name], f"no stats for {name}"
        mean_span = sum(spans[name]) / len(spans[name])
        # global span is 63; z-ordered files must average well under
        # half of it in BOTH dims (a 1-D sort gives ~full span on the
        # trailing column)
        assert mean_span < 0.5 * 63, f"{name}: mean span {mean_span}"

    # and the rewrite is lossless
    back = spark.read.parquet(zpath)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_positional_index_build_query_and_phrase(spark, tmp_path):
    """store/posting.py positional extension: positions survive the
    bucketed round-trip, the phrase path counts occurrences (incl.
    repeats) exactly, and an incremental update plus replay guard
    matches a full rebuild."""
    from agrobr_spark.store.posting import (
        build_positional_index,
        phrase_match_indexed,
        query_postings,
        read_manifest,
        update_positional_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "big scan query big scan query big"),
            (2, "scan query"),
            (3, "  "),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "pidx")
    build_positional_index(docs, path, n_buckets=8)
    assert read_manifest(path)["kind"] == "positional"

    got = {
        (r["pos"], r["termo"])
        for r in query_postings(spark, path, ("big",)).collect()
        if r["doc_id"] == 1
    }
    assert got == {(0, "big"), (3, "big"), (6, "big")}

    hits = {
        (r["doc_id"], r["frase"]): r["n_ocorrencias"]
        for r in phrase_match_indexed(
            spark, path, ("scan query big", "scan query")
        ).collect()
    }
    assert hits == {
        (1, "scan query big"): 2,
        (1, "scan query"): 2,
        (2, "scan query"): 1,
    }

    # incremental fold: new doc appended into the frozen buckets ...
    novo = spark.createDataFrame(
        [(9, "scan query big")], "doc_id bigint, text string"
    )
    update_positional_index(novo, path, batch_id=1)
    # ... and a replayed epoch is a no-op, not a double-count
    update_positional_index(novo, path, batch_id=1)
    hits2 = {
        (r["doc_id"], r["frase"]): r["n_ocorrencias"]
        for r in phrase_match_indexed(
            spark, path, ("scan query big",)
        ).collect()
    }
    assert hits2 == {(1, "scan query big"): 2, (9, "scan query big"): 1}

    full = str(tmp_path / "pidx_full")
    build_positional_index(docs.union(novo), full, n_buckets=8)
    direto = {
        (r["doc_id"], r["frase"]): r["n_ocorrencias"]
        for r in phrase_match_indexed(
            spark, full, ("scan query big",)
        ).collect()
    }
    assert direto == hits2


def test_posting_index_empty_epoch_is_guarded_noop(spark, tmp_path):
    """r10 review finding: an EMPTY epoch (no docs, or all-blank
    texts) must not commit a rows-free batch directory — a
    partitioned write of an empty frame emits no parquet files, and a
    committed empty directory would brick every later read. The
    batch_id still enters the replay guard, queries keep working, and
    a non-empty epoch with a later id lands normally."""
    from agrobr_spark.store.posting import (
        _postings_frame,
        build_posting_index,
        read_manifest,
        read_stats,
        update_posting_index,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "idx")
    build_posting_index(corpus, path, n_buckets=8)

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    blank = spark.createDataFrame([(9, "   ")], "doc_id bigint, text string")
    update_posting_index(empty, path, batch_id=0)
    update_posting_index(blank, path, batch_id=1)
    man = read_manifest(path)
    assert man["applied_batch_ids"] == [0, 1]
    assert man["active_batches"] == []
    assert _postings_frame(spark, path).count() == 2  # still readable
    assert read_stats(spark, path).collect()[0]["n"] == 1
    # replay of the empty epoch stays a no-op; a real epoch still lands
    update_posting_index(empty, path, batch_id=0)
    update_posting_index(
        spark.createDataFrame([(2, "gamma")], "doc_id bigint, text string"),
        path,
        batch_id=2,
    )
    assert read_stats(spark, path).collect()[0]["n"] == 2


def test_compaction_preserves_epoch_committed_during_rewrite(
    spark, tmp_path, monkeypatch
):
    """r10 review finding: an ingest epoch that commits WHILE
    compaction is rewriting must survive the generation swap — both
    its documents and its replay-guard entry. Simulated by injecting a
    real update just before compaction's locked pointer swap (after
    the rewrite, i.e. after ``folded`` was computed from the stale
    entry snapshot)."""
    from agrobr_spark.store import posting as P

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    P.build_posting_index(corpus, path, n_buckets=8)
    P.update_posting_index(
        spark.createDataFrame([(3, "delta")], "doc_id bigint, text string"),
        path,
        batch_id=0,
    )
    late = spark.createDataFrame(
        [(4, "epsilon zeta")], "doc_id bigint, text string"
    )

    orig_lmu = P._locked_manifest_update
    state = {"fired": False, "busy": False}

    def lmu(p, mut):
        # the first locked update in this scope is compaction's
        # pointer swap — inject the late epoch BEFORE it takes the
        # lock (the injected update's own commit recurses here, hence
        # the busy guard)
        if not state["busy"] and not state["fired"]:
            state["fired"] = True
            state["busy"] = True
            P.update_posting_index(late, p, batch_id=42)
            state["busy"] = False
        return orig_lmu(p, mut)

    monkeypatch.setattr(P, "_locked_manifest_update", lmu)
    P.compact_posting_index(spark, path)
    monkeypatch.setattr(P, "_locked_manifest_update", orig_lmu)

    man = P.read_manifest(path)
    assert man["version"] == 1
    assert man["active_batches"] == [42]  # the late epoch survived
    assert 42 in man["applied_batch_ids"] and 0 in man["applied_batch_ids"]
    stats = P.read_stats(spark, path).collect()[0]
    assert stats["n"] == 4  # 2 corpus + batch 0 + the late epoch
    docs_seen = {
        r["doc_id"] for r in P._postings_frame(spark, path).collect()
    }
    assert docs_seen == {1, 2, 3, 4}
    # the late epoch's replay guard still works post-compaction
    P.update_posting_index(late, path, batch_id=42)
    assert P.read_stats(spark, path).collect()[0]["n"] == 4


def test_update_commit_straddling_compaction_survives(
    spark, tmp_path, monkeypatch
):
    """r10 ADVICE (the other direction of the rewrite race): an
    update that READS the manifest before a compaction's pointer swap
    and COMMITS after it must not write its stale entry snapshot back
    — that would resurrect the deleted generation's postings_dir and
    brick the index. _commit_batch's re-read-and-merge lands only the
    epoch's own delta in the NEW generation's manifest. Simulated by
    running a real compaction just before the update's commit step."""
    from agrobr_spark.store import posting as P

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    P.build_posting_index(corpus, path, n_buckets=8)
    P.update_posting_index(
        spark.createDataFrame([(3, "delta")], "doc_id bigint, text string"),
        path,
        batch_id=0,
    )
    late = spark.createDataFrame(
        [(4, "epsilon zeta")], "doc_id bigint, text string"
    )

    orig_commit = P._commit_batch
    fired = {"done": False}

    def commit_after_swap(p, bid, guarded):
        if not fired["done"]:
            fired["done"] = True
            P.compact_posting_index(spark, p)  # swap happens first
        orig_commit(p, bid, guarded)

    monkeypatch.setattr(P, "_commit_batch", commit_after_swap)
    P.update_posting_index(late, path, batch_id=7)
    monkeypatch.setattr(P, "_commit_batch", orig_commit)

    man = P.read_manifest(path)
    assert man["version"] == 1
    assert man["postings_dir"] == "postings_v1"  # NOT resurrected
    assert man["active_batches"] == [7]
    assert 7 in man["applied_batch_ids"] and 0 in man["applied_batch_ids"]
    docs_seen = {
        r["doc_id"] for r in P._postings_frame(spark, path).collect()
    }
    assert docs_seen == {1, 2, 3, 4}
    assert P.read_stats(spark, path).collect()[0]["n"] == 4
    # replay stays a no-op, and the NEXT compaction folds the epoch
    P.update_posting_index(late, path, batch_id=7)
    assert P.read_stats(spark, path).collect()[0]["n"] == 4
    P.compact_posting_index(spark, path)
    man2 = P.read_manifest(path)
    assert man2["version"] == 2 and man2["active_batches"] == []
    assert {
        r["doc_id"] for r in P._postings_frame(spark, path).collect()
    } == {1, 2, 3, 4}


def test_locked_json_update_serializes_interleaved_committers(tmp_path):
    """r11 VERDICT next #3: the manifest read-modify-writes were
    individually atomic but UNSERIALIZED — two overlapping committers
    could each read the same snapshot and the second replace would
    drop the first's delta. locked_json_update must force the second
    committer to wait and re-read: FORCED ordering — committer A is
    held open inside the critical section (Event) while B and a
    compaction-style swap both arrive; every delta must survive."""
    import threading

    from agrobr_spark.store.fs import commit_json, locked_json_update, read_json

    path = str(tmp_path / "manifest.json")
    commit_json(path, {"active": [], "version": 0})

    a_inside = threading.Event()
    a_release = threading.Event()

    def slow_append(cur):
        a_inside.set()
        assert a_release.wait(timeout=30)
        cur["active"] = cur["active"] + ["A"]
        return cur

    def committer_a():
        locked_json_update(path, slow_append)

    results = []

    def committer_b():
        a_inside.wait(timeout=30)
        locked_json_update(
            path, lambda cur: dict(cur, active=cur["active"] + ["B"])
        )
        results.append("B-done")

    def swapper():
        a_inside.wait(timeout=30)
        locked_json_update(
            path, lambda cur: dict(cur, version=cur["version"] + 1)
        )
        results.append("swap-done")

    ta = threading.Thread(target=committer_a)
    tb = threading.Thread(target=committer_b)
    tc = threading.Thread(target=swapper)
    ta.start()
    assert a_inside.wait(timeout=30)
    tb.start()
    tc.start()
    # B and the swap are BLOCKED while A holds the lock: nothing has
    # committed on top of the initial manifest yet
    import time

    time.sleep(0.3)
    assert results == []
    assert read_json(path) == {"active": [], "version": 0}
    a_release.set()
    for t in (ta, tb, tc):
        t.join(timeout=30)
        assert not t.is_alive()
    final = read_json(path)
    # all three deltas landed — the unserialized primitive dropped
    # one of these whenever two writers overlapped
    assert sorted(final["active"]) == ["A", "B"]
    assert final["version"] == 1


def test_locked_json_update_crash_safety_and_timeout(
    tmp_path, monkeypatch
):
    """Crash-safety of the lock itself: flock(2) is released by the
    KERNEL when its holder dies (fd closed), so a committer that
    crashed inside the window can never wedge the store — a leftover
    lockfile with no flock on it does not block at all. A lock HELD
    by a live holder is honored until the loud timeout."""
    import fcntl
    import os
    import subprocess
    import sys

    import pytest

    from agrobr_spark.store import fs as fs_mod
    from agrobr_spark.store.fs import commit_json, locked_json_update, read_json

    path = str(tmp_path / "m.json")
    commit_json(path, {"v": 0})

    # 'crashed holder': a child process takes the flock and DIES
    # holding it — the kernel releases it with the fd, so the next
    # committer proceeds immediately
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import fcntl, os, sys\n"
                f"fd = os.open({path + '.lock'!r}, os.O_CREAT | os.O_RDWR)\n"
                "fcntl.flock(fd, fcntl.LOCK_EX)\n"
                "os._exit(0)  # dies holding the lock, no unlock\n"
            ),
        ]
    )
    assert child.returncode == 0
    assert os.path.exists(path + ".lock")  # lockfile left behind
    locked_json_update(path, lambda cur: dict(cur, v=cur["v"] + 1))
    assert read_json(path) == {"v": 1}

    # live holder: flock held on another fd — must block, then raise
    # the loud timeout (never break a live holder's lock)
    monkeypatch.setattr(fs_mod, "LOCK_TIMEOUT_S", 0.2)
    fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        with pytest.raises(TimeoutError, match="held beyond"):
            locked_json_update(path, lambda cur: cur)
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    # released: the same update now lands
    locked_json_update(path, lambda cur: dict(cur, v=cur["v"] + 1))
    assert read_json(path) == {"v": 2}


def test_manifest_primitives_reject_remote_schemes(tmp_path):
    """r10 ADVICE: the local-posix manifest primitives must FAIL
    LOUDLY on an object-store path — a silent open() would write
    driver-local state while the data lands remotely. file: URIs
    normalize; s3a/hdfs raise."""
    import pytest

    from agrobr_spark.store.fs import (
        commit_json,
        read_json,
        require_local_path,
    )

    p = str(tmp_path / "m.json")
    commit_json(f"file://{p}", {"v": 1})
    assert read_json(p) == {"v": 1}
    assert require_local_path(p) == p
    for bad in (f"s3a://bucket/idx", f"hdfs://nn/idx"):
        with pytest.raises(ValueError, match="conditional put"):
            require_local_path(bad)
    with pytest.raises(ValueError):
        commit_json("s3a://bucket/m.json", {})


def test_manifest_guard_hadoop_single_slash_forms(tmp_path):
    """r11 review: Hadoop's Path.toString() emits the SINGLE-slash
    scheme form (file:/tmp/x, hdfs:/nn/x) which the `://`-only guard
    let through as a literal relative path — a present manifest then
    read back as a silent None. All scheme-qualified spellings must
    either normalize to the same local path or raise; an authority
    that names another host must never normalize."""
    import pytest

    from agrobr_spark.store.fs import (
        commit_json,
        read_json,
        require_local_path,
    )

    p = str(tmp_path / "m.json")
    commit_json(p, {"v": 7})
    # Hadoop single-slash and rfc8089 forms all reach the SAME file
    assert require_local_path(f"file:{p}") == p
    assert require_local_path(f"file://{p}") == p
    assert require_local_path(f"file://localhost{p}") == p
    assert read_json(f"file:{p}") == {"v": 7}
    # single-slash remote schemes raise like their :// spellings
    with pytest.raises(ValueError, match="conditional put"):
        require_local_path("hdfs:/nn/idx/m.json")
    # a remote authority must not silently become /host/path
    with pytest.raises(ValueError, match="authority"):
        require_local_path("file://otherhost/tmp/m.json")
    with pytest.raises(ValueError, match="relative"):
        require_local_path("file:relative/m.json")
    # r11 ADVICE follow-ups: scheme matching is case-insensitive
    # (RFC 3986 — FILE: is the local scheme, S3A: is still remote)...
    assert require_local_path(f"FILE:{p}") == p
    with pytest.raises(ValueError, match="conditional put"):
        require_local_path("S3A://bucket/idx/m.json")
    # ...and the degenerate no-path authority forms must not hand the
    # commit primitives the filesystem ROOT
    for degenerate in ("file://", "file://localhost"):
        with pytest.raises(ValueError, match="no path component"):
            require_local_path(degenerate)


def test_posting_compaction_deferred_vacuum_reader_survives(
    spark, tmp_path
):
    """r12 VERDICT next #5: compaction must not yank superseded
    directories from under an in-flight reader. Superseded dirs are
    now RECORDED in the manifest's ``garbage`` list at the pointer
    swap and deleted only by the NEXT compaction — a reader whose
    plan listed the pre-swap generation collects cleanly across one
    full compaction, and the second compaction vacuums the first's
    garbage."""
    import os

    from agrobr_spark.store.posting import (
        bm25_topk_indexed,
        build_posting_index,
        compact_posting_index,
        read_manifest,
        update_posting_index,
    )

    docs = [
        (i, f"alpha term{i % 7} beta term{i % 5} gamma") for i in range(30)
    ]
    path = str(tmp_path / "idx")
    build_posting_index(
        spark.createDataFrame(docs[:20], "doc_id bigint, text string"),
        path,
        n_buckets=8,
    )
    update_posting_index(
        spark.createDataFrame(docs[20:], "doc_id bigint, text string"),
        path,
        batch_id=0,
    )
    terms = ("alpha", "term3", "gamma")
    # the in-flight reader: plan + file listing happen NOW, against
    # the pre-compaction generation
    reader = bm25_topk_indexed(spark, path, terms, 10, 1.2, 0.75)
    expected = [tuple(r) for r in reader.collect()]

    compact_posting_index(spark, path)
    man = read_manifest(path)
    # superseded dirs recorded, NOT deleted: the reader's files live on
    assert sorted(man["garbage"]) == sorted(
        ["postings", "stats", "batches/b00000001099511627776"]
    )
    for d in man["garbage"]:
        assert os.path.exists(os.path.join(path, d)), d
    assert [tuple(r) for r in reader.collect()] == expected  # survives

    # the NEXT compaction vacuums the previous generation's garbage
    compact_posting_index(spark, path)
    man2 = read_manifest(path)
    for d in man["garbage"]:
        assert not os.path.exists(os.path.join(path, d)), d
    assert sorted(man2["garbage"]) == sorted(["postings_v1", "stats_v1"])


def test_posting_commit_raises_on_missing_manifest(spark, tmp_path):
    """r12 ADVICE #2: a commit-time read-modify-write against a
    MISSING manifest must fail loudly, not fabricate a fresh
    version-0 manifest that masks a broken/mislocated store. Only
    build_posting_index creates manifests."""
    import os

    import pytest

    from agrobr_spark.store.posting import (
        _commit_batch,
        _record_empty_epoch,
        build_posting_index,
    )

    path = str(tmp_path / "idx")
    build_posting_index(
        spark.createDataFrame(
            [(1, "alpha beta")], "doc_id bigint, text string"
        ),
        path,
        n_buckets=2,
    )
    os.remove(os.path.join(path, "manifest.json"))
    with pytest.raises(FileNotFoundError, match="manifest missing"):
        _commit_batch(path, -1, False)
    with pytest.raises(FileNotFoundError, match="manifest missing"):
        _record_empty_epoch(path, 3)
    assert not os.path.exists(os.path.join(path, "manifest.json"))


def test_posting_local_ids_never_reused_after_compaction(spark, tmp_path):
    """The deferred vacuum makes local-id reuse FATAL (a reused id's
    directory sits in the garbage list awaiting deletion), so the
    manifest carries a ``local_low`` watermark: local epoch ids keep
    counting down across compactions even though compaction empties
    ``active_batches``."""
    from agrobr_spark.store.posting import (
        bm25_topk_indexed,
        build_posting_index,
        compact_posting_index,
        read_manifest,
        update_posting_index,
    )

    docs = [(i, f"alpha term{i % 7} beta") for i in range(30)]
    path = str(tmp_path / "idx")
    build_posting_index(
        spark.createDataFrame(docs[:10], "doc_id bigint, text string"),
        path,
        n_buckets=4,
    )
    # two LOCAL (un-idd) updates -> ids -1, -2
    update_posting_index(
        spark.createDataFrame(docs[10:15], "doc_id bigint, text string"),
        path,
    )
    update_posting_index(
        spark.createDataFrame(docs[15:20], "doc_id bigint, text string"),
        path,
    )
    assert read_manifest(path)["local_low"] == -2
    compact_posting_index(spark, path)
    man = read_manifest(path)
    assert man["active_batches"] == []
    assert man["local_low"] == -2  # watermark survives the fold
    # next local update must take -3, whose dir is NOT in the garbage
    update_posting_index(
        spark.createDataFrame(docs[20:25], "doc_id bigint, text string"),
        path,
    )
    man = read_manifest(path)
    assert man["active_batches"] == [-3]
    assert man["local_low"] == -3
    # and the second compaction (which vacuums gen-1 garbage) still
    # serves every document
    compact_posting_index(spark, path)
    got = bm25_topk_indexed(spark, path, ("alpha",), 30, 1.2, 0.75)
    assert got.count() == 25


def test_posting_compaction_vacuum_is_crash_safe(
    spark, tmp_path, monkeypatch
):
    """r13 review: the vacuum runs BEFORE the generation write and
    pointer swap. The old post-commit ordering removed the garbage
    list from the manifest and only then deleted the dirs, so a crash
    between the two leaked a generation forever. Now a crash at any
    point leaves the manifest still naming the (possibly
    already-deleted) dirs, and the retry re-vacuums them as a
    no-op."""
    import os

    from agrobr_spark.store import posting as posting_mod
    from agrobr_spark.store.posting import (
        bm25_topk_indexed,
        build_posting_index,
        compact_posting_index,
        read_manifest,
        update_posting_index,
    )

    docs = [(i, f"alpha term{i % 7} beta") for i in range(20)]
    path = str(tmp_path / "idx")
    build_posting_index(
        spark.createDataFrame(docs[:10], "doc_id bigint, text string"),
        path,
        n_buckets=4,
    )
    update_posting_index(
        spark.createDataFrame(docs[10:], "doc_id bigint, text string"),
        path,
        batch_id=0,
    )
    compact_posting_index(spark, path)
    g1 = read_manifest(path)["garbage"]
    assert g1  # gen-1 debris awaiting the deferred vacuum

    # crash the SECOND compaction just before its manifest commit
    def boom(path_, mut):
        raise RuntimeError("crash before pointer swap")

    monkeypatch.setattr(posting_mod, "_locked_manifest_update", boom)
    with pytest.raises(RuntimeError, match="crash before pointer swap"):
        compact_posting_index(spark, path)
    monkeypatch.undo()

    # the vacuum already ran (dirs gone) but the manifest is
    # untouched — it still names them, which must be harmless
    man = read_manifest(path)
    assert sorted(man["garbage"]) == sorted(g1)
    for d in g1:
        assert not os.path.exists(os.path.join(path, d)), d

    # retry completes: re-vacuum no-ops, the torn generation dirs are
    # overwritten (same version number), every document still served
    compact_posting_index(spark, path)
    got = bm25_topk_indexed(spark, path, ("alpha",), 30, 1.2, 0.75)
    assert got.count() == 20


def test_posting_update_rejects_explicit_negative_batch_id(
    spark, tmp_path
):
    """r13 review: an explicit negative batch_id would bypass the
    local_low watermark (the guarded commit branch never advances
    it), letting a post-compaction local ingest re-draw a folded id
    whose directory the deferred vacuum still names — so it is
    rejected loudly at both update entry points."""
    from agrobr_spark.store.posting import (
        build_posting_index,
        build_positional_index,
        update_positional_index,
        update_posting_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id bigint, text string"
    )
    more = spark.createDataFrame(
        [(2, "alpha gamma")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "idx")
    build_posting_index(docs, path, n_buckets=4)
    with pytest.raises(ValueError, match="must be >= 0"):
        update_posting_index(more, path, batch_id=-1)
    ppath = str(tmp_path / "pidx")
    build_positional_index(docs, ppath, n_buckets=4)
    with pytest.raises(ValueError, match="must be >= 0"):
        update_positional_index(more, ppath, batch_id=-1)


def test_staged_swap_reader_skips_busy_lock(spark, tmp_path):
    """r13 review: a reader finding the swap lock HELD must skip
    recovery instead of blocking — a busy lock always means a LIVE
    process is mid-swap (a crashed holder's flock is kernel-released
    with its fd), so there is no crash to repair and waiting up to
    the timeout would stall every read behind an O(table-files)
    delete."""
    import fcntl
    import os
    import time

    from agrobr_spark.store.table import ParquetStore

    path = str(tmp_path / "t_busy")
    store = ParquetStore(spark, path, primary_key=("k",))
    store.overwrite(spark.createDataFrame([(1,)], "k int"))
    staged = store._staged_dir()
    spark.createDataFrame([(9,)], "k int").write.parquet(staged)

    # a live holder (this test) takes the swap lock
    fd = os.open(staged + ".lock", os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        t0 = time.monotonic()
        got = [r[0] for r in store.read().collect()]
        assert time.monotonic() - t0 < 10  # skipped, not timed out
        assert got == [1]  # served MAIN; committed stage left alone
        assert os.path.exists(staged)
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    # lock free again: the next read rolls the stage forward
    assert [r[0] for r in store.read().collect()] == [9]
    assert not os.path.exists(staged)


def test_parquet_store_reader_survives_concurrent_merge(spark, tmp_path):
    """r12 VERDICT next #5, table side: a reader that planned its
    scan before a merge must not CRASH when the merge rewrites (or
    empties + deletes) partitions under it — ParquetStore.read() sets
    ignoreMissingFiles, so the race degrades to a best-effort
    snapshot instead of a mid-job FileNotFoundException."""
    from agrobr_spark.store.table import ParquetStore

    store = ParquetStore(
        spark, str(tmp_path / "t"), primary_key=("k",), partition_col="p"
    )
    store.merge_upsert(
        spark.createDataFrame(
            [(1, 10, 0), (2, 20, 1)], "k int, comp int, p int"
        )
    )
    # the in-flight reader: listing happens at plan time, now
    reader = store.read()
    # the merge MOVES k=1 out of p=0 (emptying it -> directory
    # deleted) and rewrites p=1's files
    store.merge_upsert(
        spark.createDataFrame([(1, 11, 1)], "k int, comp int, p int"),
        extra_partitions=[0],
    )
    got = sorted((r["k"], r["comp"]) for r in reader.collect())
    # no crash; best-effort snapshot (p=0's files are gone, p=1 was
    # rewritten in place so its listing may see old or new files)
    for row in got:
        assert row in [(1, 10), (1, 11), (2, 20)]
    # a FRESH read sees the merged state exactly
    assert sorted(
        (r["k"], r["comp"]) for r in store.read().collect()
    ) == [(1, 11), (2, 20)]
