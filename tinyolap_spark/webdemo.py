"""Web demos — the reference's presentation shells over this engine's
API surface, all three variants:

- tesla (``samples/tesla_web_demo.py:23-106``) — :func:`play_tesla`;
- enterprise (``samples/enterprise_web_demo.py:22-115``) — serves a
  LIST of cubes and rolls a random one per new report
  (``enterprise_web_demo.py:41-44``); :func:`play_enterprise` rebuilds
  the ported enterprise sales cube from the captured fixture;
- tutor (``samples/tutor_web_demo.py:20-106``) — the German tutor
  model parsed from its TXT dimension files; :func:`play_tutor`.

The reference serves a FastAPI app that renders a RANDOM report on
every request (``render_report``) plus a ``/info`` JSON catalog.  This
port keeps the exact route surface (``/``, ``/report``, ``/nextreport``,
``/info``) but serves it with the standard library's HTTP server — same
choice :mod:`tinyolap_spark.api` makes, so the engine stays deployable
anywhere a Python driver runs (FastAPI/uvicorn are not runtime
dependencies).

Determinism: the reference's report randomness and random data make
golden-testing impossible; here the ``play_*`` builders write
deterministic facts (the differential-port convention of
``tests/test_tesla_port.py`` / ``test_samples_port.py``) and
:func:`render_report` takes an optional seeded ``random.Random`` so a
test can pin the report layout.
"""

from __future__ import annotations

import json
import os
import random
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

from .database import Database
from .server import Server
from .slice import Slice


def play_tesla(spark, actual: float = 600.0) -> Database:
    """The tesla sample model (reference ``samples/tesla.py:23-86``),
    deterministic: Plan dense-filled at 500, 2023 plan ×1.5, constant
    Actuals instead of the reference's random generator."""

    def delta_percent(c):
        if c.Plan:  # reference tesla.py:13-17 — guard division by zero
            return c.Delta / c.Plan
        return None

    db = Database("tesla", spark=spark)
    dt = db.add_dimension("datatypes").edit()
    dt.add_many(["Actual", "Plan"])
    dt.add_many("Delta", ["Actual", "Plan"], [1.0, -1.0])
    dt.add_many("Delta %")
    dt.commit()
    yrs = db.add_dimension("years").edit()
    yrs.add_many(["2021", "2022", "2023"])
    yrs.commit()
    per = db.add_dimension("periods").edit()
    per.add_many("Year", ["Q1", "Q2", "Q3", "Q4"])
    per.commit()
    reg = db.add_dimension("regions").edit()
    reg.add_many("Total", ["North", "South", "West", "East"])
    reg.commit()
    prod = db.add_dimension("products").edit()
    prod.add_many("Total", ["Model S", "Model 3", "Model X", "Model Y"])
    prod.commit()
    cube = db.add_cube("sales", [dt, yrs, per, reg, prod])
    cube.register_rule(delta_percent, trigger=["datatypes:Delta %"])
    db.dimensions["datatypes"].member_set_format("Delta", "{:+,.0f}")
    db.dimensions["datatypes"].member_set_format("Delta %", "{:+.2%}")
    cube["Plan"].set_value(500.0, True)  # dense fill: 192 cells
    cube["Plan", "2023"] = cube["Plan", "2022"] * 1.50
    cube["Actual"].set_value(actual, True)
    return db


_ENTERPRISE_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "enterprise_model.json.gz",
)

def _default_tutor_dir() -> "str | None":
    """Resolve the tutor TXT dimension directory from the environment:
    ``TINYOLAP_TUTOR_DIR`` directly, else ``samples/tutor_model`` under
    ``TINYOLAP_REFERENCE_ROOT`` (a checkout of the reference repo).
    No machine-specific path is baked into library code (ADVICE r9) —
    callers on an arbitrary checkout pass ``tutor_dir=`` or set one of
    the two variables."""
    explicit = os.environ.get("TINYOLAP_TUTOR_DIR")
    if explicit:
        return explicit
    root = os.environ.get("TINYOLAP_REFERENCE_ROOT")
    if root:
        return os.path.join(root, "samples", "tutor_model")
    return None


def play_enterprise(spark, fixture_path: "str | None" = None) -> Database:
    """The enterprise demo model (reference
    ``samples/enterprise_web_demo.py:22-23``: several cubes served from
    one database, a random one per new report), rebuilt from the
    captured fixture the differential ports use
    (``tests/fixtures/enterprise_model.json.gz`` — dims/edges/facts
    recorded by RUNNING the reference's
    ``samples/enterprise_model/model.py``).  Builds BOTH ported cubes —
    ``sales`` and ``pnl`` — sharing their identical years/periods/
    companies dimensions."""
    import gzip

    from .rules import RuleScope, rule

    with gzip.open(fixture_path or _ENTERPRISE_FIXTURE, "rt") as f:
        fx = json.load(f)

    db = Database("enterprise", spark=spark)

    def build_dims(dim_specs):
        dims = []
        for d in dim_specs:
            if d["name"] in db.dimensions:
                dims.append(db.dimensions[d["name"]])
                continue
            dim = db.add_dimension(d["name"]).edit()
            for m in d["order"]:
                dim.add_many(m)
            for parent, child, w in d["edges"]:
                dim.add_member(parent, [child], [w])
            dim.commit()
            dims.append(dim)
        return dims

    sales = db.add_cube("sales", build_dims(fx["dims"]))

    @rule("sales", trigger=["salesfig:Price"], scope=RuleScope.ALL_LEVELS)
    def price(c):
        quantity = c["salesfig:Quantity"]
        if quantity:
            return c["salesfig:Sales"] / quantity

    sales.register_rule(price)
    sales.write_rows([tuple(a) + (v,) for a, v in fx["facts"]])

    pnl = db.add_cube("pnl", build_dims(fx["pnl"]["dims"]))

    @rule("pnl", trigger=["ACTvsPL%"], scope=RuleScope.ALL_LEVELS)
    def actvspl_pct(c):
        plan = c["datatype:Plan"]
        if plan:
            return (c["datatype:Actual"] - plan) / plan
        return None

    pnl.register_rule(actvspl_pct)
    pnl.write_rows([tuple(a) + (v,) for a, v in fx["pnl"]["facts"]])
    return db


def play_tutor(spark, tutor_dir: "str | None" = None) -> Database:
    """The tutor demo model (reference ``samples/tutor_web_demo.py:24``:
    the German 'Verkauf' cube loaded from TXT dimension files), with the
    deterministic fact generator the golden tests use
    (``tests/test_samples_port.py`` seed-7 rows).  ``tutor_dir`` (or
    ``TINYOLAP_TUTOR_DIR``) must point at the tutor TXT files; raises
    ``FileNotFoundError`` with the looked-up path otherwise."""
    from .rules import RuleScope, rule
    from .sources.csvimport import dimension_from_tutor_file

    tdir = tutor_dir or _default_tutor_dir()
    if tdir is None or not os.path.isdir(tdir):
        raise FileNotFoundError(
            f"tutor TXT dimension files not found at {tdir!r}; pass "
            f"tutor_dir= or set TINYOLAP_TUTOR_DIR (or "
            f"TINYOLAP_REFERENCE_ROOT pointing at a reference checkout)"
        )
    db = Database("tutor", spark=spark)
    dims = []
    for name in ["jahre", "datenart", "regionen", "produkte", "monate",
                 "wertart"]:
        dim = dimension_from_tutor_file(name, f"{tdir}/{name.upper()}.TXT")
        db.dimensions[name] = dim
        dims.append(dim)
    cube = db.add_cube("verkauf", dims)

    @rule("verkauf", trigger=["Preis"], scope=RuleScope.AGGREGATION_LEVEL)
    def preis(c):
        umsatz = c["Umsatz"]
        menge = c["Menge"]
        if menge != 0.0:
            return umsatz / menge
        return "-"

    cube.register_rule(preis)
    # deterministic fill over a fixed leaf sample (seed-7 generator,
    # identical to tests/test_samples_port.py::tutor_rows so the demo
    # values line up with the captured reference goldens)
    rng = random.Random(7)
    regions = ["Argentinien", "Belgien", "Brasilien", "Bulgarien",
               "Chile", "Deutschland"]
    products = ["Deskmate 386/25", "Deskmate 386/33", "Deskmate 486/33",
                "Deskmate 486/50", "Deskmate 486/66"]
    rows = []
    for jahr in ["1993", "1994"]:
        for art in ["Ist", "Plan"]:
            for reg in regions:
                for prod in products:
                    for monat in ["Januar", "Februar", "Juni", "Dezember"]:
                        menge = float(rng.randrange(1, 50))
                        preis_v = float(rng.randrange(100, 900))
                        rows.append((jahr, art, reg, prod, monat,
                                     "Menge", menge))
                        rows.append((jahr, art, reg, prod, monat,
                                     "Umsatz", menge * preis_v))
                        rows.append((jahr, art, reg, prod, monat,
                                     "variable Kosten",
                                     round(menge * preis_v * 0.6, 2)))
    cube.write_rows(rows)
    return db


def random_report_def(
    cube,
    rng: "random.Random | None" = None,
    db_name: "str | None" = None,
) -> dict:
    """A random report definition over ``cube`` — the reference's layout
    logic (``tesla_web_demo.py:40-58``): every dimension gets a random
    filter member, one random dimension goes to columns, one to rows
    (the larger one to rows), the rest to the header."""
    rng = rng or random
    by_name = {d.name: d for d in cube.dimensions}
    dims = [{"dimension": d.name} for d in cube.dimensions]
    rng.shuffle(dims)
    for spec in dims:
        members = by_name[spec["dimension"]].get_members()
        spec["member"] = members[rng.randrange(0, len(members))]
    header = dims[: len(dims) - 2]
    cand_a, cand_b = dims[-2]["dimension"], dims[-1]["dimension"]
    col_dim, row_dim = (
        (cand_a, cand_b)
        if len(by_name[cand_a]) <= len(by_name[cand_b])
        else (cand_b, cand_a)
    )
    title = f"Random report on cube <strong>{cube.name}</strong>"
    if db_name:
        # enterprise/tutor variants carry the database in the title
        # (reference enterprise_web_demo.py:64-65)
        title += f" from database <strong>{db_name}</strong>"
    return {
        "title": title,
        "header": header,
        "columns": [{"dimension": col_dim}],
        "rows": [{"dimension": row_dim}],
    }


def render_report(
    cube,
    report_def: "dict | None" = None,
    rng: "random.Random | None" = None,
    db_name: "str | None" = None,
) -> "tuple[str, dict]":
    """Render one report as HTML; returns ``(html, report_def)`` so the
    caller can refresh the SAME report (``/report``) or roll a new one
    (``/nextreport``) — the reference's ``refresh_only`` toggle."""
    if report_def is None:
        report_def = random_report_def(cube, rng, db_name)
    cube.reset_counters()
    start = time.time()
    s = Slice(cube, report_def)
    duration = time.time() - start
    footer = (
        f"Report refreshed in {duration:.6f} sec. "
        f"{cube.counter_cell_requests:,}x cell requests, "
        f"{cube.counter_aggregations:,}x aggregations calculated and "
        f"{cube.counter_rule_requests:,}x rules executed."
    )
    title = report_def.get("title", "")
    html = (
        "<html><body>"
        f"<h2>{title}</h2>"
        f"{s.as_html()}"
        f"<footer>{footer}</footer>"
        "</body></html>"
    )
    return html, report_def


class WebDemoServer:
    """The demo's route surface on the stdlib HTTP server:

    - ``GET /`` and ``GET /report`` — re-render the CURRENT report
    - ``GET /nextreport``           — roll a new random report
    - ``GET /info``                 — JSON service catalog
      (reference ``tesla_web_demo.py:96-102``)

    ``port=0`` binds an ephemeral port (tests); ``url`` exposes it.
    """

    def __init__(
        self,
        db: Database,
        cube_name: "str | Sequence[str]" = "sales",
        host: str = "127.0.0.1",
        port: int = 0,
        seed: Optional[int] = None,
        show_db_in_title: bool = False,
    ):
        self.server = Server(spark=db.spark)
        self.server.add_database(db)
        self.db = db
        # several cubes → a RANDOM one per new report, the previous one
        # on refresh (reference enterprise_web_demo.py:41-44)
        names = (
            [cube_name] if isinstance(cube_name, str) else list(cube_name)
        )
        self.cubes = [db.cube(n) for n in names]
        self.cube = self.cubes[0]
        self.show_db_in_title = show_db_in_title
        self.rng = random.Random(seed)
        self._report_def: "dict | None" = None
        self._lock = threading.RLock()
        demo = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def do_GET(self):
                try:
                    if self.path in ("/", "/report"):
                        body = demo.render(refresh_only=True)
                        ctype = "text/html"
                    elif self.path == "/nextreport":
                        body = demo.render(refresh_only=False)
                        ctype = "text/html"
                    elif self.path == "/info":
                        body = json.dumps(demo.info())
                        ctype = "application/json"
                    else:
                        self.send_error(404)
                        return
                except Exception as exc:  # surface, don't hang the demo
                    self.send_error(500, str(exc)[:200])
                    return
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: "threading.Thread | None" = None

    def render(self, refresh_only: bool = True) -> str:
        with self._lock:
            rdef = self._report_def if refresh_only else None
            if rdef is None:
                self.cube = self.rng.choice(self.cubes)
            html, self._report_def = render_report(
                self.cube,
                rdef,
                self.rng,
                self.db.name if self.show_db_in_title else None,
            )
            return html

    def info(self) -> dict:
        from . import __version__

        # reference tesla_web_demo.py:96-102: service + version + catalog
        return {
            "service": "tinyolap_spark",
            "version": __version__,
            "databases": [
                {"name": db.name}
                for db in self.server._databases.values()
            ],
        }

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "WebDemoServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def demo_server(
    spark, variant: str = "tesla", port: int = 0, seed: "int | None" = None
) -> WebDemoServer:
    """Build the model for ``variant`` (tesla / enterprise / tutor —
    one per reference ``samples/*_web_demo.py``) and wrap it in a
    route-complete :class:`WebDemoServer`."""
    if variant == "tesla":
        return WebDemoServer(play_tesla(spark), "sales", port=port,
                             seed=seed)
    if variant == "enterprise":
        return WebDemoServer(
            play_enterprise(spark), ["sales", "pnl"], port=port,
            seed=seed, show_db_in_title=True,
        )
    if variant == "tutor":
        return WebDemoServer(
            play_tutor(spark), "verkauf", port=port, seed=seed,
            show_db_in_title=True,
        )
    raise ValueError(f"unknown web-demo variant {variant!r}")


if __name__ == "__main__":  # pragma: no cover - manual demo
    import sys

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    which = sys.argv[1] if len(sys.argv) > 1 else "tesla"
    demo = demo_server(spark, which, port=8000).start()
    print(f"serving {which} on {demo.url} — /, /report, /nextreport, /info")
    demo._thread.join()
