"""GraphQL surface (reference ``api/graphql/graphql_schema.py`` — SURVEY Q6).

The reference exposes a small schema over the engine::

    type Cell { db: String, cube: String!, address: [String!], value: Float! }
    type Query {
        read(db: String, cube: String!, address: [String!]): Cell!
        random_read: Cell!
        random_write: Cell!
    }
    type Mutation {
        write(db: String, cube: String!, address: [String!], value: Float!): Boolean!
    }

No GraphQL library ships in this runtime, so this module implements a
STDLIB-ONLY executor for the subset the schema needs: named/anonymous
``query`` and ``mutation`` operations, field aliases, inline scalar /
list / object arguments, and ``$variables``.  Fragments, directives and
subscriptions are not supported (the reference schema uses none).
``catalog`` and ``databases`` root fields are added on top so the GraphQL
surface is catalog-complete like the REST one.

Execution is driver-side metadata + point reads — cell reads batch through
the same cached read path as the REST endpoints; bulk traffic should speak
DataFrames, not GraphQL.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from .database import Database


class GraphQLError(Exception):
    pass


# ---------------------------------------------------------------------------
# lexer / parser (GraphQL subset)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>[\s,]+|\#[^\n]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>-?\d+\.\d+|-?\d+)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punct>[{}()\[\]:$!=@])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise GraphQLError(f"unexpected character {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


@dataclass
class _Field:
    name: str
    alias: str
    args: dict[str, Any]
    selection: "Optional[list[_Field]]" = None


@dataclass
class _Operation:
    kind: str  # "query" | "mutation"
    fields: list[_Field] = field(default_factory=list)


class _Parser:
    def __init__(self, src: str, variables: Optional[dict] = None):
        self.toks = _tokenize(src)
        self.i = 0
        self.variables = variables or {}

    def _peek(self):
        return self.toks[self.i]

    def _next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def _expect(self, value: str):
        kind, val = self._next()
        if val != value:
            raise GraphQLError(f"expected {value!r}, got {val!r}")

    def parse(self) -> _Operation:
        kind, val = self._peek()
        op = "query"
        if kind == "name" and val in ("query", "mutation"):
            op = val
            self._next()
            if self._peek()[0] == "name":  # operation name
                self._next()
            if self._peek()[1] == "(":  # variable definitions: skip to ')'
                depth = 0
                while True:
                    _k, v = self._next()
                    if v == "(":
                        depth += 1
                    elif v == ")":
                        depth -= 1
                        if depth == 0:
                            break
        elif kind == "name":
            raise GraphQLError(f"unknown operation type {val!r}")
        return _Operation(op, self._selection_set())

    def _selection_set(self) -> list[_Field]:
        self._expect("{")
        fields = []
        while self._peek()[1] != "}":
            fields.append(self._field())
        self._next()  # consume }
        if not fields:
            raise GraphQLError("empty selection set")
        return fields

    def _field(self) -> _Field:
        kind, name = self._next()
        if kind != "name":
            raise GraphQLError(f"expected field name, got {name!r}")
        alias = name
        if self._peek()[1] == ":":
            self._next()
            kind, name = self._next()
            if kind != "name":
                raise GraphQLError("expected field name after alias")
        args: dict[str, Any] = {}
        if self._peek()[1] == "(":
            self._next()
            while self._peek()[1] != ")":
                akind, aname = self._next()
                if akind != "name":
                    raise GraphQLError(f"bad argument name {aname!r}")
                self._expect(":")
                args[aname] = self._value()
            self._next()  # consume )
        selection = None
        if self._peek()[1] == "{":
            selection = self._selection_set()
        return _Field(name, alias, args, selection)

    def _value(self) -> Any:
        kind, val = self._next()
        if kind == "string":
            return json.loads(val)
        if kind == "number":
            return float(val) if "." in val else int(val)
        if kind == "name":
            if val == "true":
                return True
            if val == "false":
                return False
            if val == "null":
                return None
            return val  # enum-ish bare name
        if val == "$":
            vkind, vname = self._next()
            if vkind != "name":
                raise GraphQLError("expected variable name after $")
            if vname not in self.variables:
                raise GraphQLError(f"variable ${vname} not provided")
            return self.variables[vname]
        if val == "[":
            items = []
            while self._peek()[1] != "]":
                items.append(self._value())
            self._next()
            return items
        if val == "{":
            obj = {}
            while self._peek()[1] != "}":
                okind, oname = self._next()
                if okind != "name" and okind != "string":
                    raise GraphQLError("bad object key")
                self._expect(":")
                obj[json.loads(oname) if okind == "string" else oname] = (
                    self._value()
                )
            self._next()
            return obj
        raise GraphQLError(f"unexpected value token {val!r}")


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------


# fields that mutate data regardless of operation kind (random_write is a
# QUERY root field in the reference schema but performs a cube write)
_MUTATING_FIELDS = frozenset({"write", "random_write"})


def required_action(query: str, variables: "Optional[dict]" = None) -> str:
    """Authorization class of a GraphQL document: ``"write"`` if it is a
    mutation OR selects any mutating field, else ``"read"``.

    Parses with the REAL tokenizer/parser — a leading comment or exotic
    whitespace cannot disguise a mutation the way a string-prefix check
    could.  Unparseable documents classify as ``"write"`` (fail closed;
    the executor will reject them with a parse error anyway).
    """
    try:
        op = _Parser(query, variables).parse()
    except Exception:  # noqa: BLE001 — fail closed
        return "write"
    if op.kind == "mutation":
        return "write"

    def walk(fields) -> bool:
        for f in fields:
            if f.name in _MUTATING_FIELDS:
                return True
            if f.selection and walk(f.selection):
                return True
        return False

    return "write" if walk(op.fields) else "read"


class GraphQLExecutor:
    """Executes the reference schema against a database registry."""

    def __init__(self, databases: "dict[str, Database] | Database"):
        if isinstance(databases, Database):
            databases = {databases.name: databases}
        self.databases = {k.lower(): v for k, v in databases.items()}

    # -- helpers ----------------------------------------------------------
    def _db(self, name: Optional[str]) -> Database:
        if name is None:
            if len(self.databases) != 1:
                raise GraphQLError(
                    "db argument required with multiple databases"
                )
            return next(iter(self.databases.values()))
        try:
            return self.databases[str(name).lower()]
        except KeyError:
            raise GraphQLError(f"unknown database {name!r}") from None

    @staticmethod
    def _project(obj: dict, selection: Optional[list[_Field]]) -> dict:
        if selection is None:
            return obj
        out = {}
        for f in selection:
            if f.name not in obj:
                raise GraphQLError(f"unknown field {f.name!r}")
            v = obj[f.name]
            out[f.alias] = (
                GraphQLExecutor._project(v, f.selection)
                if isinstance(v, dict) and f.selection
                else v
            )
        return out

    def _cell(self, db, cube, address) -> dict:
        value = cube.get(tuple(address))
        return {
            "db": db.name,
            "cube": cube.name,
            "address": list(address),
            "value": value,
        }

    def _random_address(self, db):
        import random

        cube = next(iter(db.cubes.values()))
        return cube, [
            random.choice([m.name for m in d.leaf_members])
            for d in cube.dimensions
        ]

    # -- entry ------------------------------------------------------------
    def execute(
        self, query: str, variables: Optional[dict] = None
    ) -> dict:
        """Returns the spec response envelope ``{"data": ...}`` or
        ``{"errors": [{"message": ...}]}``."""
        try:
            op = _Parser(query, variables).parse()
            data: dict[str, Any] = {}
            for f in op.fields:
                data[f.alias] = self._resolve(op.kind, f)
            return {"data": data}
        except GraphQLError as e:
            return {"errors": [{"message": str(e)}]}
        except Exception as e:  # noqa: BLE001 — engine errors -> envelope
            return {"errors": [{"message": f"{type(e).__name__}: {e}"}]}

    def _resolve(self, kind: str, f: _Field) -> Any:
        if kind == "query":
            if f.name == "read":
                db = self._db(f.args.get("db"))
                cube = db.cube(f.args["cube"])
                return self._project(
                    self._cell(db, cube, f.args["address"]), f.selection
                )
            if f.name == "random_read":
                db = self._db(f.args.get("db"))
                cube, addr = self._random_address(db)
                return self._project(
                    self._cell(db, cube, addr), f.selection
                )
            if f.name == "random_write":
                import random

                db = self._db(f.args.get("db"))
                cube, addr = self._random_address(db)
                cube.set(tuple(addr), round(random.random() * 1000.0, 0))
                return self._project(
                    self._cell(db, cube, addr), f.selection
                )
            if f.name == "databases":
                return sorted(self.databases)
            if f.name == "catalog":
                from .api import RestServer

                db = self._db(f.args.get("db"))
                return self._project(
                    RestServer._catalog(db)["database"], f.selection
                )
            raise GraphQLError(f"unknown query field {f.name!r}")
        if kind == "mutation":
            if f.name == "write":
                db = self._db(f.args.get("db"))
                cube = db.cube(f.args["cube"])
                cube.set(tuple(f.args["address"]), f.args["value"])
                return True
            raise GraphQLError(f"unknown mutation field {f.name!r}")
        raise GraphQLError(f"unsupported operation {kind!r}")
