"""Hypothesis property tests (SURVEY.md §5.2 #4).

- Diff round-trip: for any two snapshots, prev - deleted + added == cur
  and added/deleted are disjoint from each other and from the overlap.
- Union-fold == multi-path scan: the reference's iterative unionByName
  (`airflow/dags/apify_dag.py:148,168`) must equal one scan of all paths.
- Gender parity: the JVM-native broadcast-join enrichment and the
  Arrow pandas-UDF variant implement the same function.

Strategy sizes stay small (Spark job per example); determinism matters
more than volume here — the operators are set-algebraic, so shrunk
counterexamples would be tiny anyway.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datalake_project_spark.functions.gender import (
    enrich_gender_native, enrich_gender_pandas_udf,
)
from datalake_project_spark.operators.diff import snapshot_diff
from tests.conftest import rows

_PROP = settings(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

names = st.sets(st.text(alphabet="abcdefgh", min_size=1, max_size=4),
                min_size=0, max_size=12)


def _snap(spark, users):
    return spark.createDataFrame(
        [(u, f"Full {u}") for u in sorted(users)] or [],
        "username string, full_name string")


@given(prev=names, cur=names)
@_PROP
def test_diff_round_trip(spark, prev, cur):
    d = snapshot_diff(_snap(spark, cur), _snap(spark, prev),
                      keys=["username", "full_name"]).collect()
    added = {r["username"] for r in d if r["change"] == "added"}
    deleted = {r["username"] for r in d if r["change"] == "deleted"}
    assert added == cur - prev
    assert deleted == prev - cur
    assert (prev - deleted) | added == cur


@given(parts=st.lists(
    st.lists(st.tuples(st.integers(0, 99),
                       st.text(alphabet="xyz", min_size=1, max_size=3)),
             min_size=0, max_size=5),
    min_size=1, max_size=4))
@_PROP
def test_union_fold_equals_multipath_scan(spark, parts, tmp_path_factory):
    base = tmp_path_factory.mktemp("ufold")
    paths = []
    dfs = []
    for i, data in enumerate(parts):
        df = spark.createDataFrame(data, "k long, v string") if data else \
            spark.createDataFrame([], "k long, v string")
        p = str(base / f"p{i}")
        df.write.mode("overwrite").parquet(p)
        paths.append(p)
        dfs.append(df)
    folded = dfs[0]
    for df in dfs[1:]:
        folded = folded.unionByName(df)
    multi = spark.read.parquet(*paths)
    assert rows(multi) == rows(folded)


LOOKUP = {"ana": "female", "bob": "male", "cab": "mostly_female",
          "dad": "mostly_male", "eee": "andy"}

name_strat = st.one_of(
    st.sampled_from(sorted(LOOKUP) + ["zzz", ""]),
    st.text(alphabet="abcde._8 ", max_size=8),
)


_KV = st.lists(st.tuples(st.integers(0, 5), st.integers(-100, 100)),
               min_size=0, max_size=12)


def _agg(df):
    from pyspark.sql import functions as F
    return df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"),
        F.min("v").alias("lo"), F.max("v").alias("hi"))


def _merge(a, b):
    from pyspark.sql import functions as F
    return a.unionByName(b).groupBy("k").agg(
        F.sum("s").alias("s"), F.sum("c").alias("c"),
        F.min("lo").alias("lo"), F.max("hi").alias("hi"))


@given(base=_KV, delta=_KV)
@_PROP
def test_incremental_agg_maintenance(spark, base, delta):
    """Incremental materialized-aggregate refresh: merging the stored
    aggregate of the base table with the aggregate of a new delta batch
    must equal re-aggregating base ∪ delta — the algebraic property that
    lets a 100 TB rollup be maintained per-partition instead of
    recomputed (sum/count/min/max are the re-associable core; avg =
    s/c derives)."""
    schema = "k long, v long"
    b = spark.createDataFrame(base or [], schema)
    d = spark.createDataFrame(delta or [], schema)
    assert rows(_merge(_agg(b), _agg(d))) == rows(_agg(b.unionByName(d)))


_WORDS = st.lists(st.sampled_from("aa bb cc dd ee ff gg hh".split()),
                  min_size=0, max_size=12)


@given(prefix_a=_WORDS, prefix_b=_WORDS, shared=st.lists(
    st.sampled_from("pp qq rr ss tt uu vv ww xx yy".split()),
    min_size=6, max_size=10))
@_PROP
def test_winnow_detection_guarantee(spark, prefix_a, prefix_b, shared):
    """Winnowing's paper guarantee (Schleimer et al. 2003): two documents
    sharing any token run of length >= k + w - 1 always share at least
    one selected fingerprint, for ANY surrounding context. k=3, w=4 here
    => shared runs of >= 6 tokens (the `shared` block) must be caught."""
    from pyspark.sql import functions as F

    from datalake_project_spark.functions.text import winnow_fingerprints, tokens

    doc_a = " ".join(prefix_a + shared)
    doc_b = " ".join(shared + prefix_b)
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)],
                               "doc_id long, text string")
    got = df.select(
        "doc_id",
        winnow_fingerprints(tokens("text"), k=3, w=4).alias("fp")).collect()
    fps = {r["doc_id"]: set(r["fp"]) for r in got}
    assert fps[1] & fps[2], (doc_a, doc_b)


@given(rows_in=st.lists(st.tuples(name_strat, name_strat), min_size=1, max_size=8))
@_PROP
def test_gender_native_equals_pandas_udf(spark, rows_in):
    df = spark.createDataFrame(rows_in, "username string, full_name string")
    lookup_df = spark.createDataFrame(list(LOOKUP.items()),
                                      "first_name string, gender string")
    via_native = enrich_gender_native(df, lookup_df)
    via_udf = enrich_gender_pandas_udf(df, LOOKUP)
    cols = ["username", "full_name", "predicted_gender", "confidence"]
    assert rows(via_native.select(*cols)) == rows(via_udf.select(*cols))


@given(data=st.lists(
    st.tuples(st.integers(min_value=0, max_value=10000),  # prob in 1e-4 steps
              st.booleans()),
    min_size=2, max_size=25).filter(
        lambda d: any(l for _, l in d) and any(not l for _, l in d)))
@_PROP
def test_histogram_auc_equals_pairwise(spark, data):
    """The sharded score-histogram AUC (queries/ml.histogram_auc — the
    formulation q_classifier_auc ships) equals the direct pairwise
    Mann-Whitney statistic: mean over (pos, neg) pairs of
    1[p > n] + 0.5*1[p == n]."""
    from datalake_project_spark.queries.ml import histogram_auc

    rows_in = [(round(p / 10000.0, 4), bool(l)) for p, l in data]
    df = spark.createDataFrame(rows_in, "prob double, label boolean")
    got = histogram_auc(df).collect()[0]

    pos = [p for p, l in rows_in if l]
    neg = [p for p, l in rows_in if not l]
    u = sum((1.0 if p > n else 0.5 if p == n else 0.0)
            for p in pos for n in neg)
    want = round(u / (len(pos) * len(neg)), 6)
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert abs(got.auc - want) < 1e-9


from hypothesis import given, settings, strategies as st


@st.composite
def _merge_case(draw):
    keys = st.integers(min_value=0, max_value=9)
    base = draw(st.dictionaries(keys, st.text("ab", max_size=2), max_size=6))
    ups = draw(st.dictionaries(keys, st.text("cd", max_size=2), max_size=4))
    dels = draw(st.sets(keys, max_size=3))
    return base, ups, dels


@settings(max_examples=8, deadline=None)
@given(_merge_case())
def test_upsert_matches_dict_merge_semantics(spark, tmp_path_factory, case):
    """MERGE algebra property: for random base/update/tombstone sets,
    Lake.upsert(delete_col=...) equals the reference dict semantics
    base | updates, minus tombstoned keys (tombstones beat updates on
    the same key only if a key is exclusively tombstoned — the query
    never emits both, so we draw them disjoint)."""
    from datalake_project_spark.lake import Lake

    base, ups, dels = case
    dels = {k for k in dels if k not in ups}  # disjoint roles per key
    expected = {**base, **ups}
    for k in dels:
        expected.pop(k, None)

    tmp = tmp_path_factory.mktemp("merge_prop")
    lake = Lake(spark, str(tmp / "lake"))
    schema = "k long, v string"
    if not base and not ups:
        return  # nothing to write (empty-frame writes need a schema path)
    if base:
        lake.write_usage(spark.createDataFrame(list(base.items()), schema),
                         "t", "20260814", "r1")
    rows = ([(k, v, False) for k, v in ups.items()]
            + [(k, None, True) for k in dels])
    if rows:
        updates = spark.createDataFrame(rows, "k long, v string, del boolean")
        lake.upsert(updates, "t", "20260814", "r1", keys=["k"],
                    delete_col="del")
    if not base and not rows:
        return
    got = {r["k"]: r["v"]
           for r in lake.read_usage("t", "20260814", "r1").collect()}
    assert got == expected


def test_kaplan_meier_estimator_invariants(spark):
    """Structural invariants of the KM curve that hold for ANY data
    (the oracle pins exact values; this pins the estimator's shape):
    survival lies in [0,1] and is non-increasing over event time,
    at-risk counts are non-increasing, and every curve point has at
    least one conversion with at_risk >= n_converted."""
    from datalake_project_spark.queries import load_all

    rows_ = (load_all()["q_events_kaplan_meier"]
             .fn(spark, "/root/testdata/sf0.001")
             .orderBy("hour").collect())
    assert rows_, "fixture must produce a non-empty curve"
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows_:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9
        assert r["n_converted"] >= 1
        assert r["at_risk"] >= r["n_converted"]
        if prev_risk is not None:
            assert r["at_risk"] <= prev_risk
        prev_s, prev_risk = r["survival"], r["at_risk"]


@given(
    files=st.lists(
        st.lists(st.integers(min_value=-1000, max_value=1000),
                 min_size=0, max_size=8),
        min_size=1, max_size=10),
    lo=st.one_of(st.none(), st.integers(min_value=-1100, max_value=1100)),
    hi=st.one_of(st.none(), st.integers(min_value=-1100, max_value=1100)),
    drop_stats=st.lists(st.booleans(), min_size=10, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_manifest_prune_never_drops_a_matching_file(files, lo, hi,
                                                    drop_stats):
    """Safety property of Iceberg-style stats skipping: for ANY file
    contents, ANY [lo, hi] predicate, and ANY subset of files missing
    stats, every file holding at least one in-range row survives
    _prune_files — pruning can only remove files that provably match
    nothing. (Completeness is separate and intentional: stats-less
    files are always kept.)"""
    from datalake_project_spark.manifest_lake import ManifestLake

    entry = {"files": [f"f{i}" for i in range(len(files))], "stats": {}}
    for i, rows_ in enumerate(files):
        if drop_stats[i % len(drop_stats)]:
            continue  # simulate a legacy entry without stats
        entry["stats"][f"f{i}"] = {
            "c": [min(rows_), max(rows_)] if rows_ else [None, None]}
    kept = set(ManifestLake._prune_files(entry, "c", lo, hi))
    for i, rows_ in enumerate(files):
        matches = any((lo is None or r >= lo) and (hi is None or r <= hi)
                      for r in rows_)
        if matches:
            assert f"f{i}" in kept, (i, rows_, lo, hi)


@st.composite
def _lifecycle_ops(draw):
    keys = st.integers(min_value=0, max_value=5)
    ops = []
    n = draw(st.integers(min_value=2, max_value=5))
    for _ in range(n):
        kind = draw(st.sampled_from(["write", "upsert", "expire"]))
        if kind == "write":
            ops.append(("write", draw(st.dictionaries(
                keys, st.text("ab", min_size=1, max_size=2),
                min_size=1, max_size=4))))
        elif kind == "upsert":
            ups = draw(st.dictionaries(keys, st.text("cd", min_size=1,
                                                     max_size=2),
                                       min_size=1, max_size=3))
            dels = {k for k in draw(st.sets(keys, max_size=2))
                    if k not in ups}
            ops.append(("upsert", ups, dels))
        else:
            ops.append(("expire", draw(st.integers(min_value=1,
                                                   max_value=3))))
    return ops


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_lifecycle_ops())
def test_manifest_lifecycle_matches_version_model(spark, tmp_path_factory,
                                                  ops):
    """Version-history property: for a random op sequence (partition
    write / MERGE upsert / expire_versions), every SURVIVING manifest
    version time-travels to exactly the model's snapshot at that
    version, expired versions raise, and the head always equals the
    model head. This pins the r6 metadata-bounding machinery
    (expire_versions + the _latest pointer) against the same dict model
    the MERGE property uses."""
    from datalake_project_spark.manifest_lake import ManifestLake

    D_, T_ = "2026-02-01", "T01"
    tmp = tmp_path_factory.mktemp("mlife")
    lake = ManifestLake(spark, str(tmp))
    schema = "k long, v string"
    state: dict = {}
    history: dict[int, dict] = {}   # version -> full snapshot
    live_versions: list[int] = []

    for op in ops:
        if op[0] == "write":
            state = dict(op[1])
            lake.write_usage(spark.createDataFrame(list(state.items()),
                                                   schema), "t", D_, T_)
            v = lake.latest_version("t")
            history[v] = dict(state)
            live_versions.append(v)
        elif op[0] == "upsert":
            _, ups, dels = op
            if not state and not ups:
                continue
            state = {**state, **ups}
            for k in dels:
                state.pop(k, None)
            rows = ([(k, v_, False) for k, v_ in ups.items()]
                    + [(k, None, True) for k in dels])
            lake.upsert(spark.createDataFrame(rows,
                                              "k long, v string, "
                                              "del boolean"),
                        "t", D_, T_, keys=["k"], delete_col="del")
            v = lake.latest_version("t")
            history[v] = dict(state)
            live_versions.append(v)
        else:
            keep = op[1]
            expired = lake.expire_versions("t", keep_last=keep)
            live_versions = [v for v in live_versions if v not in expired]

    if not live_versions:
        return
    assert lake.latest_version("t") == live_versions[-1]
    got_head = {r["k"]: r["v"]
                for r in lake.read_usage("t", D_, T_).collect()}
    assert got_head == history[live_versions[-1]]
    for v in live_versions:  # every surviving version time-travels
        got = {r["k"]: r["v"]
               for r in lake.read_usage_at("t", v, D_, T_).collect()}
        assert got == history[v], f"v{v} snapshot drifted"
    for v in sorted(set(history) - set(live_versions)):
        try:
            lake.read_usage_at("t", v, D_, T_).collect()
            raise AssertionError(f"expired v{v} still resolves")
        except FileNotFoundError:
            pass


# --- as-of joins vs pandas merge_asof (the stated contract) -----------

_asof_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),          # group key
              st.integers(min_value=0, max_value=50)),  # seconds
    min_size=0, max_size=10)


@given(left=_asof_rows, right=_asof_rows,
       tol=st.sampled_from([None, 7.0]))
@_PROP
def test_asof_joins_match_pandas_merge_asof(spark, left, right, tol):
    """Backward and nearest as-of joins must equal pandas
    merge_asof(direction='backward'/'nearest') on arbitrary small
    inputs — including duplicate timestamps, empty sides, and
    tolerance. Right-side ts values are unique per (group, ts) (pandas
    tie order among equal right keys is positional, ours is value-
    deterministic), which is the documented determinism condition."""
    import pandas as pd
    from pyspark.sql import functions as F

    from datalake_project_spark.operators.joins import (
        asof_join, asof_join_nearest)

    right = list({(k, t) for k, t in right})  # unique per (group, ts)
    lpdf = pd.DataFrame(
        [(i, k, pd.Timestamp(t, unit="s")) for i, (k, t) in
         enumerate(left)], columns=["id", "k", "ts"])
    rpdf = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s")) for k, t in right],
        columns=["k", "ts"]).astype({"k": "object",
                                     "ts": "datetime64[ns]"})
    ldf = spark.createDataFrame(
        [(int(i), k, int(t)) for i, (k, t) in enumerate(left)],
        "id long, k string, t long").select(
        "id", "k", F.timestamp_seconds("t").alias("ts"))
    rdf = spark.createDataFrame(
        [(k, int(t)) for k, t in right] or [("zz", 0)],
        "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts"))
    if not right:
        rdf = rdf.where(F.col("k") != "zz")

    kw = {} if tol is None else {"tolerance": pd.Timedelta(seconds=tol)}
    for direction, fn in (("backward", asof_join),
                          ("nearest", asof_join_nearest)):
        if len(lpdf):
            # recover the matched right ts via an explicit value column
            rpdf2 = rpdf.assign(rv=rpdf["ts"])
            exp = pd.merge_asof(
                lpdf.sort_values(["ts", "id"]), rpdf2.sort_values("ts"),
                on="ts", by="k", direction=direction, **kw)
            expected = {int(r.id): (None if pd.isna(r.rv)
                                    else r.rv.timestamp())
                        for r in exp.itertuples()}
        else:
            expected = {}
        got_rows = fn(ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
                      right_cols=["ts"], suffix="_r",
                      tolerance_seconds=tol).collect()
        got = {r["id"]: (None if r["ts_r"] is None
                         else r["ts_r"].timestamp()) for r in got_rows}
        assert got == expected, direction
