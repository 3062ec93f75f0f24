"""Map the TESTDATA TPC-H-ish star schema into a cube (FIXTURES.md §B).

Dimensions (driver-side metadata, built by collecting only the TINY tables —
``region`` (5 rows) and ``nation`` (25); everything fact-sized stays
executor-side):

- ``geo``      : All Geographies -> region -> nation (leaves = nations),
                 plus the multi-parent test member ``AMERICA+ASIA``;
- ``calendar`` : All Time -> year -> quarter -> month (leaves = months,
                 derived from the fixed TPC-H date envelope 1992-1998);
- ``brand``    : All Brands -> brand (leaves = 25 p_brand values);
- ``measures`` : quantity, extendedprice, discount_amt, revenue as leaves;
                 ``net_price`` = extendedprice - discount_amt (weighted
                 rollup, weights +1/-1 — exercises A2/A7 of SURVEY §2).

Fact build is a pure DataFrame pipeline (scales to 100 TB):

    lineitem ⋈ orders (o_orderdate)  — shuffle join on orderkey
             ⋈ broadcast(customer-slim ⋈ nation)  — customer is the big dim
             ⋈ broadcast(part-slim)
             |> unpivot measures (stack)
             |> map names -> member ids via broadcast dicts

At sf0.1 customer/part easily broadcast; at 100 TB they become shuffle
joins automatically when they exceed the broadcast threshold — the plan is
declarative, AQE decides.  Measure unpivot multiplies rows x4; at scale
prefer keeping measures as COLUMNS (the engine supports per-column
aggregation too) — the unpivoted layout is the cube-model parity shape.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..database import Database
from ..metadata import Dimension

def date_years(orders: DataFrame) -> list[int]:
    """Min/max order year from the data — one column-pruned aggregate."""
    row = orders.select(
        F.min(F.year("o_orderdate")).alias("lo"),
        F.max(F.year("o_orderdate")).alias("hi"),
    ).collect()[0]
    return list(range(int(row["lo"]), int(row["hi"]) + 1))


CUBE_TABLES = ["region", "nation", "customer", "part", "orders", "lineitem"]


def load_tables(
    spark: SparkSession, sf_dir: str, names: Optional[list[str]] = None
) -> dict[str, DataFrame]:
    out = {}
    for n in names or CUBE_TABLES:
        try:
            out[n] = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        except Exception:
            pass
    return out


def build_geo_dimension(db: Database, region: DataFrame, nation: DataFrame) -> Dimension:
    rn = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select("r_name", "n_name")
        .collect()
    )
    return build_geo_dimension_from_pairs(
        db, [(r["r_name"], r["n_name"]) for r in rn]
    )


def build_geo_dimension_from_pairs(
    db: Database, pairs: list[tuple[str, str]]
) -> Dimension:
    geo = db.add_dimension("geo").edit()
    by_region: dict[str, list[str]] = {}
    for rname, nname in pairs:
        by_region.setdefault(rname, []).append(nname)
    regions = sorted(by_region)
    geo.add_many("All Geographies", regions)
    for r in regions:
        geo.add_many(r, sorted(by_region[r]))
    # multi-parent member for overlap semantics tests
    geo.add_many("AMERICA+ASIA", ["AMERICA", "ASIA"])
    geo.commit()
    # per-nation attribute: owning region (exercises P8/P10/J4 attribute ops)
    attr = geo.add_attribute("region", str)
    for rname, nname in pairs:
        attr.set(nname, rname)
    return geo


def build_calendar_dimension(db: Database, years) -> Dimension:
    cal = db.add_dimension("calendar").edit()
    cal.add_many("All Time", [str(y) for y in years])
    for y in years:
        cal.add_many(str(y), [f"{y}-Q{q}" for q in (1, 2, 3, 4)])
        for q in (1, 2, 3, 4):
            months = [f"{y}-{m:02d}" for m in range(3 * q - 2, 3 * q + 1)]
            cal.add_many(f"{y}-Q{q}", months)
    cal.commit()
    return cal


def build_brand_dimension(db: Database, part: DataFrame) -> Dimension:
    brands = sorted(
        r["p_brand"] for r in part.select("p_brand").distinct().collect()
    )
    return build_brand_dimension_from_names(db, brands)


def build_brand_dimension_from_names(
    db: Database, brands: list[str]
) -> Dimension:
    brand = db.add_dimension("brand").edit()
    brand.add_many("All Brands", sorted(brands))
    brand.commit()
    return brand


def build_measures_dimension(db: Database) -> Dimension:
    m = db.add_dimension("measures").edit()
    m.add_many("quantity")
    m.add_many("extendedprice")
    m.add_many("discount_amt")
    m.add_many("revenue")
    m.add_many("net_price", ["extendedprice", "discount_amt"], [1.0, -1.0])
    m.commit()
    return m


def _literal_id_map(pairs) -> "F.Column":
    """name/key -> member-id lookup as a LITERAL map expression.

    r13 optimization (guide §2.4/§3.1): the dimension id maps are
    driver-known and tiny (25 nations, ~84 months, 25 brands), so
    resolving them with ``element_at(create_map(...), key)`` inside the
    small-side projections replaces three broadcast-joined map frames —
    and the nation join — with codegen map lookups.  The fact pipeline
    drops from 7 BroadcastExchange builds to 3 and stops paying three
    string-keyed hash probes per LINEITEM row (the lookups now run on
    the orders/customer/part sides, 4-40x smaller).  Measured: fact
    compute 2.3s -> 1.6s at sf0.1 (plan: 7 -> 3 broadcasts)."""
    args = []
    for k, v in pairs:
        args.append(F.lit(k))
        args.append(F.lit(v))
    return F.create_map(*args)


def fact_frame(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    geo: Dimension,
    cal: Dimension,
    brand: Dimension,
    measures: Dimension,
    nation_key_names: "Optional[dict[int, str]]" = None,
) -> DataFrame:
    """lineitem -> (geo INT, calendar INT, brand INT, measures INT, value).

    Decimal-exact measure arithmetic so results are bit-reproducible across
    engines (used by the DuckDB differential oracle).

    ``nation_key_names`` (n_nationkey -> n_name, driver-known — StarCube
    collects it in the same single metadata job) lets the customer side
    resolve its geo member id with a literal-map lookup instead of a
    nation join; omitted, the join path runs unchanged.
    """
    li, orders = tables["lineitem"], tables["orders"]
    customer, nation, part = tables["customer"], tables["nation"], tables["part"]

    geo_ids = {m.name: m.index for m in geo.leaf_members}
    cal_ids = [(m.name, m.index) for m in cal.leaf_members]
    brand_ids = [(m.name, m.index) for m in brand.leaf_members]

    if nation_key_names is not None:
        # key -> member id folded into one literal map: no nation join
        cust_geo = customer.select(
            "c_custkey",
            F.element_at(
                _literal_id_map(
                    [
                        (k, geo_ids[n])
                        for k, n in nation_key_names.items()
                        if n in geo_ids
                    ]
                ),
                F.col("c_nationkey"),
            ).alias("geo_id"),
        ).where(F.col("geo_id").isNotNull())
    else:
        cust_geo = (
            customer.select("c_custkey", "c_nationkey")
            .join(
                F.broadcast(nation.select("n_nationkey", "n_name")),
                customer["c_nationkey"] == nation["n_nationkey"],
            )
            .select(
                "c_custkey",
                F.element_at(
                    _literal_id_map(list(geo_ids.items())), F.col("n_name")
                ).alias("geo_id"),
            )
            .where(F.col("geo_id").isNotNull())
        )

    orders_slim = orders.select(
        "o_orderkey",
        "o_custkey",
        F.element_at(
            _literal_id_map(cal_ids),
            F.date_format("o_orderdate", "yyyy-MM"),
        ).alias("cal_id"),
    ).where(F.col("cal_id").isNotNull())
    part_brand = part.select(
        "p_partkey",
        F.element_at(_literal_id_map(brand_ids), F.col("p_brand")).alias(
            "brand_id"
        ),
    ).where(F.col("brand_id").isNotNull())

    from ..pipeline.dedup import _spread

    # Money measures load as integral "cents" doubles: every aggregation is
    # then exact integer arithmetic (< 2^53), so results are bit-identical
    # across engines and partition orders — the property the DuckDB
    # differential oracle hash-match depends on.
    #
    # _spread (r13): the fixture lineitem ships as ONE single-row-group
    # parquet file, so the scan — and the joins + partial aggregation
    # whole-stage-fused to it — runs on ONE core regardless of split
    # conf.  The guarded repartition (no-op unless the source is a
    # provably small local file set) moves the narrow projected rows
    # once and parallelizes the rest; at real scale file splits already
    # exceed parallelism and nothing is shuffled.  Measured: fact
    # compute 1.5-1.7s -> 1.1-1.3s at sf0.1.
    df = (
        _spread(li.select(
            "l_orderkey",
            "l_partkey",
            F.col("l_quantity").alias("m_quantity"),
            F.round(F.col("l_extendedprice") * 100, 0).alias("m_extendedprice"),
            F.round(
                F.col("l_extendedprice") * F.col("l_discount") * 100, 0
            ).alias("m_discount_amt"),
            F.round(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100,
                0,
            ).alias("m_revenue"),
        ))
        .join(
            orders_slim, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(F.broadcast(cust_geo), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part_brand), F.col("l_partkey") == F.col("p_partkey"))
    )

    mnames = ["quantity", "extendedprice", "discount_amt", "revenue"]
    # aggregate to the cube grain BEFORE unpivoting: the shuffle carries one
    # 4-measure row per (geo, month, brand) instead of 4x the lineitem count
    grouped = df.groupBy(
        F.col("geo_id").alias("geo"),
        F.col("cal_id").alias("calendar"),
        F.col("brand_id").alias("brand"),
    ).agg(*[F.sum(f"m_{m}").alias(f"m_{m}") for m in mnames])
    stack_expr = "stack({}, {}) as (measures, value)".format(
        len(mnames),
        ", ".join(
            f"{measures.member(m).index}, cast(m_{m} as double)" for m in mnames
        ),
    )
    fact = grouped.select(
        "geo", "calendar", "brand", F.expr(stack_expr)
    ).withColumn("value_str", F.lit(None).cast("string"))
    return fact


def _collect_dim_metadata(tables: dict[str, DataFrame]):
    """One Spark job collects everything the dimension builds need:
    (region, nation) pairs, distinct brands, and the order-year range —
    a 3-way union of tiny projections instead of 3 separate jobs."""
    nation, region = tables["nation"], tables["region"]
    rn = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select(
            F.lit("geo").alias("kind"),
            F.col("r_name").alias("a"),
            F.col("n_name").alias("b"),
            F.col("n_nationkey").cast("string").alias("c"),
        )
    )
    brands = tables["part"].select(
        F.lit("brand").alias("kind"),
        F.col("p_brand").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.lit(None).cast("string").alias("c"),
    ).distinct()
    yr = tables["orders"].agg(
        F.lit("years").alias("kind"),
        F.min(F.year("o_orderdate")).cast("string").alias("a"),
        F.max(F.year("o_orderdate")).cast("string").alias("b"),
        F.lit(None).cast("string").alias("c"),
    )
    rows = rn.unionByName(brands).unionByName(yr).collect()
    geo_pairs = [(r["a"], r["b"]) for r in rows if r["kind"] == "geo"]
    brand_names = sorted(r["a"] for r in rows if r["kind"] == "brand")
    yrow = next(r for r in rows if r["kind"] == "years")
    years = list(range(int(yrow["a"]), int(yrow["b"]) + 1))
    # n_nationkey -> n_name, collected in the SAME job: fact_frame's
    # customer side resolves geo ids with a literal map instead of a
    # nation join (see _literal_id_map)
    nation_key_names = {
        int(r["c"]): r["b"] for r in rows if r["kind"] == "geo"
    }
    return geo_pairs, brand_names, years, nation_key_names


class StarCube:
    """A cube over the TESTDATA star schema + handles to the raw tables."""

    def __init__(self, spark: SparkSession, sf_dir: str, measures_subset=None):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = load_tables(spark, sf_dir)
        self.db = Database("star", spark=spark)
        geo_pairs, brand_names, years, nation_key_names = (
            _collect_dim_metadata(self.tables)
        )
        self.geo = build_geo_dimension_from_pairs(self.db, geo_pairs)
        self.years = years
        self.cal = build_calendar_dimension(self.db, self.years)
        self.brand = build_brand_dimension_from_names(self.db, brand_names)
        self.measures = build_measures_dimension(self.db)
        self.cube = self.db.add_cube(
            "sales", [self.geo, self.cal, self.brand, self.measures]
        )
        fact = fact_frame(
            spark, self.tables, self.geo, self.cal, self.brand,
            self.measures, nation_key_names=nation_key_names,
        )
        if measures_subset:
            ids = [self.measures.member(m).index for m in measures_subset]
            fact = fact.where(F.col("measures").isin(ids))
        # fact_frame pre-aggregates to the cube grain — one row per address
        self.cube.load_dataframe(fact, assume_unique=True)

    def member_names_df(self, dim: Dimension, alias: str) -> DataFrame:
        from .. import engine

        return engine.members_df(self.spark, dim).select(
            F.col("member_id").alias(f"{alias}_id"), F.col("name").alias(alias)
        )
