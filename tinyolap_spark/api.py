"""Minimal REST API over the engine (reference ``api/rest/`` — SURVEY Q6).

The reference serves a FastAPI app with catalog, cell read/write and view
endpoints (``api/rest/main.py:28-33``, ``routers/cells.py:25-58``,
``tiny/catalog.py:4``).  This module provides the same surface on the
standard library only (no FastAPI/pydantic in the runtime), which keeps
the engine deployable anywhere a Python driver runs:

- ``GET  /catalog``                         — database catalog (cubes, dims, counts)
- ``GET  /databases``                       — registered database names
- ``POST /cells/get``   ``{database, cube, members}``          -> value
- ``POST /cells/batch`` ``{database, cube, addresses: [...]}`` -> values
  (ONE Spark job via ``Cube.get_many`` — the Spark-right way to serve
  many point reads; the reference resolves cells one at a time)
- ``PUT  /cells``       ``{database, cube, members, value}``   -> write
- ``POST /query``       ``{database, sql}``  -> mini-SQL records
- ``GET  /views?database=..&cube=..&rows=dim&columns=dim`` -> view dict
- ``POST /graphql``     ``{query, variables}`` -> GraphQL envelope
  (reference ``api/graphql/graphql_schema.py`` schema — see
  :mod:`tinyolap_spark.graphql`)

Mutations serialize through an RLock (the reference wraps writes in a
writer lock, ``routers/cells.py:42-55``).  Intended for interactive /
tool access, not as a high-QPS data plane — bulk traffic should speak
DataFrames.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse

from .database import Database


class AuthenticationError(Exception):
    """Missing or invalid HTTP Basic credentials (maps to 401)."""


class RestServer:
    """``RestServer({"mydb": db}).start()`` -> serving on ``port``."""

    def __init__(
        self,
        databases: "dict[str, Database] | Database",
        host: str = "127.0.0.1",
        port: int = 0,
        auth: bool = False,
    ):
        """``auth=True`` gates every endpoint with HTTP Basic credentials
        checked against the target database's user registry (reference
        users.py/authorization.py roles): read endpoints need READER,
        ``PUT /cells`` and GraphQL mutations need WRITER."""
        if isinstance(databases, Database):
            databases = {databases.name: databases}
        self.databases = {k.lower(): v for k, v in databases.items()}
        self.auth = auth
        self._lock = threading.RLock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: Any) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def _route(self, method: str) -> None:
                from .users import NotAuthorizedError

                try:
                    url = urlparse(self.path)
                    query = parse_qs(url.query)
                    body = self._body() if method != "GET" else {}
                    if outer.auth:
                        outer._check_auth(
                            method, url.path, query, body,
                            self.headers.get("Authorization"),
                        )
                    out = outer._dispatch(method, url.path, query, body)
                    self._send(200, out)
                except AuthenticationError as e:
                    self.send_response(401)
                    self.send_header("WWW-Authenticate", 'Basic realm="tinyolap"')
                    body = json.dumps({"detail": str(e)}).encode()
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except NotAuthorizedError as e:
                    self._send(403, {"detail": str(e)})
                except KeyError as e:
                    self._send(404, {"detail": f"not found: {e}"})
                except Exception as e:  # noqa: BLE001 — error envelope
                    self._send(400, {"detail": str(e)})

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

            def do_PUT(self):
                self._route("PUT")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    # ----------------------------------------------------------- lifecycle
    def start(self) -> "RestServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)

    # ---------------------------------------------------------------- auth
    def _check_auth(
        self, method: str, path: str, query: dict, body: dict, header
    ) -> None:
        """HTTP Basic -> user lookup in the TARGET database's registry ->
        role gate.  Read endpoints need ``read``; ``PUT /cells`` and
        GraphQL ``mutation`` operations need ``write`` (reference role
        semantics, authorization.py:14-38)."""
        import base64 as _b64

        if not header or not header.startswith("Basic "):
            raise AuthenticationError("missing credentials")
        try:
            raw = _b64.b64decode(header[6:]).decode()
            username, _, password = raw.partition(":")
        except Exception:  # noqa: BLE001
            raise AuthenticationError("malformed credentials") from None
        action = "read"
        if method == "PUT" and path == "/cells":
            action = "write"
        elif path == "/graphql":
            # parse-based classification (the real tokenizer): a mutation
            # OR any mutating field (random_write is a query-root field
            # that writes) requires "write"; unparseable docs fail closed
            from .graphql import required_action

            action = required_action(
                str(body.get("query", "")), body.get("variables")
            )
        # resolve target databases.  /catalog without ?database serves the
        # FIRST registered db (mirror _dispatch's default), so gate that
        # exact db, not "any".
        name = body.get("database") or (query.get("database") or [None])[0]
        if name is None and path == "/catalog":
            name = next(iter(self.databases))
        targets = (
            [self._db(name)] if name else list(self.databases.values())
        )
        user = None
        for db in targets:
            u = db.users.authenticate(username, password or None)
            # the HTTP surface refuses passwordless accounts (the default
            # 'admin' ships without a password — accepting it would make
            # auth=True a no-op out of the box); set a password to use a
            # user over HTTP
            if u is not None and u.password is not None:
                user = u
                break
        if user is None:
            raise AuthenticationError("unknown user or wrong password")
        if name:
            targets[0].require(user, action)
            return
        # db-less paths: /databases (read-only listing) needs read on SOME
        # db; /graphql can target ANY db inside the document, so it needs
        # the action on EVERY db (fail closed — cross-db escalation
        # otherwise: write rights on dbB must not write into dbA)
        from .users import NotAuthorizedError

        ok = (
            all(db.authorize(user, action) for db in targets)
            if path == "/graphql"
            else any(db.authorize(user, action) for db in targets)
        )
        if not ok:
            raise NotAuthorizedError(
                f"user '{username}' is not authorized for action '{action}'"
            )

    # ------------------------------------------------------------ dispatch
    def _db(self, name: str) -> Database:
        return self.databases[str(name).lower()]

    def _dispatch(self, method: str, path: str, query: dict, body: dict):
        if method == "GET" and path == "/databases":
            return {"databases": sorted(self.databases)}
        if method == "GET" and path == "/catalog":
            name = query.get("database", [next(iter(self.databases))])[0]
            return self._catalog(self._db(name))
        if method == "POST" and path == "/cells/get":
            db = self._db(body["database"])
            cube = db.cube(body["cube"])
            return {"members": body["members"],
                    "value": cube.get(tuple(body["members"]))}
        if method == "POST" and path == "/cells/batch":
            db = self._db(body["database"])
            cube = db.cube(body["cube"])
            addrs = [tuple(a) for a in body["addresses"]]
            return {"values": cube.get_many(addrs)}
        if method == "PUT" and path == "/cells":
            db = self._db(body["database"])
            cube = db.cube(body["cube"])
            with self._lock:
                cube.set(tuple(body["members"]), body["value"])
            return {"ok": True}
        if method == "POST" and path == "/graphql":
            from .graphql import GraphQLExecutor

            with self._lock:  # mutations serialize like PUT /cells
                return GraphQLExecutor(self.databases).execute(
                    body.get("query", ""), body.get("variables")
                )
        if method == "POST" and path == "/query":
            from .sqlq import Query

            db = self._db(body["database"])
            q = Query(db, body["sql"]).execute()
            return {"columns": q.column_names, "records": q.records}
        if method == "GET" and path == "/views":
            from .view import View

            db = self._db(query["database"][0])
            cube = db.cube(query["cube"][0])
            v = View(
                cube,
                rows=[(d, "*") for d in query.get("rows", [])],
                columns=[(d, "*") for d in query.get("columns", [])],
            )
            v.refresh()
            return v.to_dict()
        raise KeyError(f"{method} {path}")

    @staticmethod
    def _catalog(db: Database) -> dict:
        """Reference ``tiny/catalog.py:4-28`` shape."""
        return {
            "database": {
                "id": db.name,
                "cubes": [
                    {
                        "id": c.name,
                        "description": c.description,
                        "dimensions": [d.name for d in c.dimensions],
                        "cells_count": c.cells_count,
                    }
                    for c in db.cubes.values()
                ],
                "dimensions": [
                    {
                        "id": d.name,
                        "description": d.description,
                        # len(d), not len(d.members): a from_dataframe
                        # dimension's Spark-side leaves count too
                        "members_count": len(d),
                    }
                    for d in db.dimensions.values()
                ],
            }
        }
