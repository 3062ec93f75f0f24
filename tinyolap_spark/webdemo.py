"""Web demo — the reference's presentation shell
(``samples/tesla_web_demo.py:23-106``) over this engine's API surface.

The reference serves a FastAPI app that renders a RANDOM report over the
tesla sample cube on every request (``render_report``,
``tesla_web_demo.py:37-69``) plus a ``/info`` JSON catalog.  This port
keeps the exact route surface (``/``, ``/report``, ``/nextreport``,
``/info``) but serves it with the standard library's HTTP server — same
choice :mod:`tinyolap_spark.api` makes, so the engine stays deployable
anywhere a Python driver runs (FastAPI/uvicorn are not runtime
dependencies).

Determinism: the reference's report randomness and random Actual data
make golden-testing impossible; here :func:`play_tesla` writes constant
Actuals (the differential-port convention of
``tests/test_tesla_port.py``) and :func:`render_report` takes an
optional seeded ``random.Random`` so a test can pin the report layout.
"""

from __future__ import annotations

import json
import random
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

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


def random_report_def(cube, rng: "random.Random | None" = None) -> dict:
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
    return {
        "title": f"Random report on cube <strong>{cube.name}</strong>",
        "header": header,
        "columns": [{"dimension": col_dim}],
        "rows": [{"dimension": row_dim}],
    }


def render_report(
    cube,
    report_def: "dict | None" = None,
    rng: "random.Random | None" = None,
) -> "tuple[str, dict]":
    """Render one report as HTML; returns ``(html, report_def)`` so the
    caller can refresh the SAME report (``/report``) or roll a new one
    (``/nextreport``) — the reference's ``refresh_only`` toggle."""
    if report_def is None:
        report_def = random_report_def(cube, rng)
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
        cube_name: str = "sales",
        host: str = "127.0.0.1",
        port: int = 0,
        seed: Optional[int] = None,
    ):
        self.server = Server(spark=db.spark)
        self.server.add_database(db)
        self.db = db
        self.cube = db.cube(cube_name)
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
            html, self._report_def = render_report(
                self.cube, rdef, self.rng
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


if __name__ == "__main__":  # pragma: no cover - manual demo
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    demo = WebDemoServer(play_tesla(spark), port=8000).start()
    print(f"serving on {demo.url} — /, /report, /nextreport, /info")
    demo._thread.join()
